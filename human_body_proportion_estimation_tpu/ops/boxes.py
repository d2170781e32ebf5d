"""Box coordinate math as fixed-shape JAX ops.

Covers the reference's torch/numpy box utilities
(`modules/onnx_utils.py:98-122,238-288`) and the in-graph bbox expand/clip/
normalize of the fused detector graph (`models/conv.py:39-57`) — rebuilt as
pure jnp functions that vectorize over padded fixed-size detection slots.

Two box orders appear in the reference and are kept distinct here:
  * ``xyxy``: (x1, y1, x2, y2) — YOLOv5 paths.
  * ``yxyx``: (y1, x1, y2, x2) — EfficientDet / TF paths
    (`obj_det_edet4_trtserver.py:143-146`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xyxy2xywh(b: jax.Array) -> jax.Array:
    """[..., 4] corner -> center-size (reference onnx_utils.py:269-277)."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def xywh2xyxy(b: jax.Array) -> jax.Array:
    """[..., 4] center-size -> corner (reference onnx_utils.py:280-288)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of xyxy boxes: [N,4] x [M,4] -> [N,M].

    Same math as the reference's torchvision-derived `box_iou`
    (`modules/onnx_utils.py:98-122`).
    """
    area_a = jnp.prod(jnp.maximum(a[:, 2:] - a[:, :2], 0.0), axis=-1)
    area_b = jnp.prod(jnp.maximum(b[:, 2:] - b[:, :2], 0.0), axis=-1)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def clip_xyxy(b: jax.Array, height: float, width: float) -> jax.Array:
    """Clip xyxy boxes to image bounds (reference onnx_utils.py:238-249)."""
    return jnp.stack(
        [
            jnp.clip(b[..., 0], 0, width),
            jnp.clip(b[..., 1], 0, height),
            jnp.clip(b[..., 2], 0, width),
            jnp.clip(b[..., 3], 0, height),
        ],
        axis=-1,
    )


def scale_coords_letterbox(
    boxes_xyxy: jax.Array,
    model_hw: tuple[int, int],
    orig_hw: tuple[int, int],
) -> jax.Array:
    """Invert `letterbox` back to original-image pixel coords.

    Mirrors reference `scale_coords` (`modules/onnx_utils.py:252-266`):
    gain = max(model) / max(orig); pad = (model - orig*gain)/2; subtract pad,
    divide gain, clip.
    """
    mh, mw = model_hw
    oh, ow = orig_hw
    gain = max(mh, mw) / max(oh, ow)
    pad_x = (mw - ow * gain) / 2
    pad_y = (mh - oh * gain) / 2
    shifted = boxes_xyxy - jnp.asarray(
        [pad_x, pad_y, pad_x, pad_y], dtype=boxes_xyxy.dtype
    )
    return clip_xyxy(shifted / gain, oh, ow)


def expand_clip_normalize_yxyx(
    boxes_yxyx: jax.Array,
    x_expand: jax.Array,
    y_expand: jax.Array,
    height: int,
    width: int,
) -> jax.Array:
    """Grow yxyx pixel boxes by +/- (x,y) margins, clip, normalize to [0,1].

    The in-graph bbox dilation before the pose crop
    (reference `models/conv.py:39-57`): y1-=dy, x1-=dx, y2+=dy, x2+=dx,
    clipped to the image, then divided by [h,w,h,w].
    """
    hf = jnp.asarray(height, jnp.float32)
    wf = jnp.asarray(width, jnp.float32)
    y1 = jnp.clip(boxes_yxyx[..., 0] - y_expand, 0.0, hf)
    x1 = jnp.clip(boxes_yxyx[..., 1] - x_expand, 0.0, wf)
    y2 = jnp.clip(boxes_yxyx[..., 2] + y_expand, 0.0, hf)
    x2 = jnp.clip(boxes_yxyx[..., 3] + x_expand, 0.0, wf)
    expanded = jnp.stack([y1, x1, y2, x2], axis=-1)
    return expanded / jnp.asarray([height, width, height, width], jnp.float32)
