#!/usr/bin/env bash
# Regenerate the checked-in protobuf bindings for the gRPC serving edge.
# Only `protoc --python_out` is required (no grpcio-tools plugin): the
# server registers generic method handlers, so no *_pb2_grpc stubs needed.
set -euo pipefail
cd "$(dirname "$0")/.."
protoc \
  --proto_path=human_body_proportion_estimation_tpu/serve \
  --python_out=human_body_proportion_estimation_tpu/serve \
  hbpe.proto kserve.proto
echo "wrote human_body_proportion_estimation_tpu/serve/{hbpe,kserve}_pb2.py"
