"""TPU-native human body proportion estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SamSamhuns/human_body_proportion_estimation (reference mounted read-only at
/root/reference): person detection (EfficientDet-Lite4 / YOLOv5 / SSD) ->
top-down HRNet pose estimation (17 COCO keypoints) -> geometric body
proportion lengths in cm, scaled by a user-supplied person height.

Where the reference glues a Python gRPC client to NVIDIA Triton Server (the
det->crop->pose hop scheduled by Triton's ensemble DAG, reference
`models/conv.py`), this framework runs the whole preprocess -> detect ->
filter -> crop -> pose -> heatmap-decode -> proportions path as ONE
jit-compiled XLA program resident on TPU, fed by a host-side dynamic
batching queue behind the same HTTP request/response schema
(reference `uvicorn_server/server.py:85-119`).

Layout:
    ops/        pure-JAX numerics (resize, letterbox, NMS, crop, decode, geometry)
    models/     Flax model definitions (HRNet, EfficientDet-Lite, YOLOv5, SSD)
    pipeline/   fused jit programs (detect / pose / detect_pose_proportion)
    parallel/   device mesh + sharding builders (dp x tp serving/training)
    serve/      engine, batching queue, HTTP edge (Triton replacement)
    training/   HRNet fine-tune train step (heatmap MSE) for the multi-chip path
    utils/      config tree, host IO, drawing
    cli/        drivers mirroring the reference's 5 entry points
"""

__version__ = "0.1.0"

from human_body_proportion_estimation_tpu.utils.config import (  # noqa: F401
    PipelineConfig,
)
