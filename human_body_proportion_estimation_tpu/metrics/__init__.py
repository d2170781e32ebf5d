"""Quantitative evaluation: detection mAP, pose OKS-AP and PCK.

The reference ships no accuracy evaluation at all — its only implicit
ground truth is the heights encoded in the demo fixture filenames
(`media/imgs/dave_bautista_193.jpg`, SURVEY §4/§6). This package is the
quantitative counterpart: COCO-protocol detection AP and keypoint
OKS-AP plus MPII-style PCK, so imported checkpoints (cli.import_weights)
can be validated against standard numbers, not just fixture plausibility.

Aggregation is host-side numpy by design: evaluation is offline,
variable-shape, and bandwidth-trivial — forcing it through fixed-shape
XLA programs would buy nothing (the model forward passes being evaluated
already run on the TPU via the pipeline surfaces).
"""

from human_body_proportion_estimation_tpu.metrics.detection import (  # noqa: F401
    average_precision,
    detection_ap,
    match_image,
)
from human_body_proportion_estimation_tpu.metrics.pose import (  # noqa: F401
    COCO_KP_SIGMAS,
    oks,
    oks_ap,
    pck,
)
