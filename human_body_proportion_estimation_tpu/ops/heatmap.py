"""Heatmap -> keypoint decoding, vectorized for fixed person slots.

Replaces the per-person numpy hot loop of the reference
(`modules/pose_estimator.py:75-99` + the coord remap in
`person_det_pose_edet4_trtserver.py:148-168`) with batched jnp ops that live
inside the fused pipeline program: argmax over the flattened 96x72 maps,
(x, y) recovery, confidence gating against the 17 per-keypoint thresholds,
and the heatmap->crop->image affine remap — all computed for all padded
person slots at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DecodedKeypoints(NamedTuple):
    keypoints: jax.Array  # [..., K, 2] (x, y) in heatmap coords
    scores: jax.Array     # [..., K] max heatmap activation


def decode_heatmaps(heatmaps: jax.Array) -> DecodedKeypoints:
    """Argmax-decode keypoints from heatmaps of shape [..., K, H, W].

    Matches `PoseEstimator.get_max_pred_keypts_from_heatmap`
    (`modules/pose_estimator.py:75-99`): x = idx % W, y = idx // W,
    score = max; keypoints with score <= 0 are zeroed (pred_mask).
    """
    w = heatmaps.shape[-1]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], -1)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.max(flat, axis=-1)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    kpts = jnp.stack([x, y], axis=-1)
    kpts = jnp.where(scores[..., None] > 0.0, kpts, 0.0)
    return DecodedKeypoints(kpts, scores)


def refine_subpixel(
    keypoints: jax.Array, heatmaps: jax.Array, delta: float = 0.25
) -> jax.Array:
    """Quarter-pixel refinement: shift each argmax keypoint by +-delta
    toward its higher-valued neighbor along each axis (the standard HRNet
    post-process). OPT-IN: the reference decodes with plain argmax
    (`pose_estimator.py:75-99`), so the pipeline defaults to exact parity
    and exposes this for accuracy-minded deployments.

    Args:
        keypoints: [..., K, 2] (x, y) integer argmax coords.
        heatmaps: [..., K, H, W].
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    x = keypoints[..., 0].astype(jnp.int32)
    y = keypoints[..., 1].astype(jnp.int32)

    def at(dy, dx):
        yy = jnp.clip(y + dy, 0, h - 1)
        xx = jnp.clip(x + dx, 0, w - 1)
        return jnp.take_along_axis(
            heatmaps.reshape(*heatmaps.shape[:-2], h * w),
            (yy * w + xx)[..., None],
            axis=-1,
        )[..., 0]

    dx_sign = jnp.sign(at(0, 1) - at(0, -1))
    dy_sign = jnp.sign(at(1, 0) - at(-1, 0))
    refined = keypoints + delta * jnp.stack([dx_sign, dy_sign], axis=-1)
    # only refine interior maxima (edge behavior matches common impls)
    interior = (
        (x > 0) & (x < w - 1) & (y > 0) & (y < h - 1)
    )[..., None]
    return jnp.where(interior, refined, keypoints)


def remap_to_image(
    keypoints_hm: jax.Array,
    boxes_yxyx_px: jax.Array,
    heatmap_hw: tuple[int, int],
) -> jax.Array:
    """Map heatmap-space keypoints into original-image pixel coords.

    Reference math (`person_det_pose_edet4_trtserver.py:151-160`): box
    corners are truncated to ints, then
        kp = kp / (hm_w, hm_h) * (crop_w, crop_h) + (x1, y1).

    Args:
        keypoints_hm: [..., K, 2] (x, y) heatmap coords.
        boxes_yxyx_px: [..., 4] pixel-space boxes (y1, x1, y2, x2),
            broadcast against the leading dims of keypoints.
        heatmap_hw: static (height, width) of the heatmaps.
    """
    hm_h, hm_w = heatmap_hw
    b = jnp.trunc(boxes_yxyx_px)  # reference int() truncation
    x1, y1 = b[..., 1], b[..., 0]
    crop_w = b[..., 3] - b[..., 1]
    crop_h = b[..., 2] - b[..., 0]
    scale = jnp.stack([crop_w / hm_w, crop_h / hm_h], axis=-1)
    offset = jnp.stack([x1, y1], axis=-1)
    return keypoints_hm * scale[..., None, :] + offset[..., None, :]


def gate_keypoints(
    scores: jax.Array, thresholds: jax.Array | tuple
) -> jax.Array:
    """Visibility mask: score >= per-keypoint threshold.

    The reference builds `ignored_kp_idx = {i : score < thres[i]}`
    (`person_det_pose_edet4_trtserver.py:162-163`); here visibility is the
    complement as a bool mask [..., K].
    """
    t = jnp.asarray(thresholds, jnp.float32)
    return scores >= t
