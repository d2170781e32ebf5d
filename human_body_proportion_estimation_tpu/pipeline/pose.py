"""Pose-only jit pipeline (pre-cropped person images).

Mirrors the reference's pose demo (`pose_est_hrnet_trtserver.py`): RGB/255
images resized to the crop size (288x384 W x H, :15-19) -> HRNet heatmaps
-> argmax decode, with keypoints scaled from heatmap dims to the display
image dims (:126-129). Heatmaps are emitted in the reference's channel-
first [K, H, W] layout at the output boundary.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models.hrnet import HRNet
from human_body_proportion_estimation_tpu.ops import heatmap as hm_ops


class PoseResult(NamedTuple):
    heatmaps: jax.Array   # [B, K, Hm, Wm]
    keypoints: jax.Array  # [B, K, 2] heatmap coords
    scores: jax.Array     # [B, K]


class PosePipeline:
    """jit program: f32 [B, H, W, 3] in [0,1] -> heatmaps + decoded kpts."""

    def __init__(self, model: HRNet):
        self.model = model

    def forward(self, variables: Any, crops: jax.Array) -> PoseResult:
        hm_nhwc = self.model.apply(variables, crops)
        heatmaps = jnp.moveaxis(hm_nhwc, -1, 1)
        kp, scores = hm_ops.decode_heatmaps(heatmaps)
        return PoseResult(heatmaps, kp, scores)

    def jit(self):
        return jax.jit(self.forward)


def preprocess_crop_host(
    img_rgb: np.ndarray, width: int = 288, height: int = 384
) -> np.ndarray:
    """Host preprocess for pre-cropped person images: /255 then resize
    (the reference divides before resizing, pose_est_hrnet_trtserver.py:16-18)."""
    import cv2

    img = img_rgb.astype(np.float32) / 255.0
    return cv2.resize(img, (width, height)).astype(np.float32)
