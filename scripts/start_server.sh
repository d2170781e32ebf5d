#!/usr/bin/env bash
# Launch the serving stack (HTTP 8080 + gRPC 8081) — the counterpart of the
# reference's start_servers.sh (uvicorn + Triton), collapsed to one process.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
exec python -m human_body_proportion_estimation_tpu.serve.server \
    --port "${HTTP_PORT:-8080}" \
    --grpc-port "${GRPC_PORT:-8081}" \
    --detector "${DETECTOR:-efficientdet_lite4}" \
    "$@"
