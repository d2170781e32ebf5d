#!/usr/bin/env bash
# Launch the serving stack (HTTP 8080 + gRPC 8081) — the counterpart of the
# reference's start_servers.sh (uvicorn + Triton), collapsed to one process.
# DETECTOR defaults to ssd_mobilenet: the slot with real weights out of the
# box (the EfficientDet/YOLO slots need CHECKPOINT_DIR to serve non-random
# weights — see the server's /health "weights" field).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
EXTRA=()
[ -n "${CHECKPOINT_DIR:-}" ] && EXTRA+=(--checkpoint-dir "$CHECKPOINT_DIR")
[ -n "${ARTIFACT_DIR:-}" ] && EXTRA+=(--artifact-dir "$ARTIFACT_DIR")
[ "${DATA_PARALLEL:-0}" -gt 0 ] && EXTRA+=(--data-parallel "$DATA_PARALLEL")
[ "${PREWARM:-0}" = "1" ] && EXTRA+=(--prewarm)
exec python -m human_body_proportion_estimation_tpu.serve.server \
    --port "${HTTP_PORT:-8080}" \
    --grpc-port "${GRPC_PORT:-8081}" \
    --detector "${DETECTOR:-ssd_mobilenet}" \
    "${EXTRA[@]}" \
    "$@"
