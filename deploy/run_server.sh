#!/usr/bin/env bash
# Build + (re)start the serving container — the counterpart of the
# reference's run_docker_uvicorn_fastapi_server.sh / run_docker_triton_
# server.sh pair (each of which stops a stale container by name, then
# docker-compose-runs one service with a port flag). One container serves
# both edges here, so one script takes both ports.
#
#   bash deploy/run_server.sh -h 8080 -p 8081
#
set -euo pipefail

cont_name=hbpe_tpu_server
http=8080
grpc=8081
while [[ "$#" -gt 0 ]]; do
    case $1 in
        -h|--http) http="$2"; shift ;;
        -p|--grpc) grpc="$2"; shift ;;
        *) echo "Unknown parameter passed: $1"; exit 1 ;;
    esac
    shift
done

if [ "$(docker ps -q -f name=$cont_name)" ]; then
    echo "Stopping docker container '$cont_name'"
    docker stop "$cont_name"
    docker rm -f "$cont_name" 2>/dev/null || true
    echo "Stopped & removed container '$cont_name'"
fi

echo "Running serving container: HTTP :$http  gRPC :$grpc"
cd "$(dirname "$0")"
docker compose run -d --rm \
    -p "$http:8080" -p "$grpc:8081" \
    --name "$cont_name" \
    hbpe_server
