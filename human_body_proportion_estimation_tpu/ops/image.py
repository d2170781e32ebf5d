"""On-device image preprocessing ops.

The reference does all of this on the host with cv2/PIL
(`person_det_pose_edet4_trtserver.py:15-18`, `modules/onnx_utils.py:225-235`,
`modules/utils.py:140-159`). Here only bytes->RGB-uint8 decode stays on the
host; resize / letterbox / normalize / layout run inside the jit program so
the det->pose pipeline never round-trips through Python.

All functions take NHWC (or HWC) arrays and static output sizes, so they
compile to fixed-shape XLA programs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def aspect_resize_shape(
    in_h: int, in_w: int, width: int | None, height: int | None
) -> Tuple[int, int]:
    """Output (h, w) matching the reference's aspect-preserving resize rules.

    Mirrors `modules/utils.py:140-159` (`resize_maintaining_aspect`): if both
    dims given use them; if one is None scale the other keeping aspect via
    integer floor division; if both None keep input size.
    """
    if width is not None and height is not None:
        return height, width
    if width is None and height is not None:
        return height, (in_w * height) // in_h
    if width is not None and height is None:
        return (width * in_h) // in_w, width
    return in_h, in_w


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with half-pixel centers (cv2.INTER_LINEAR convention).

    Matches cv2.resize's default interpolation within rounding tolerance;
    parity target is the reference host preprocess
    (`person_det_pose_edet4_trtserver.py:17`).
    """
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    shape = (*img.shape[:-3], out_h, out_w, img.shape[-1])
    out = jax.image.resize(x, shape, method="linear", antialias=False)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(orig_dtype)


def letterbox(
    img: jax.Array,
    out_h: int,
    out_w: int,
    in_h: int | None = None,
    in_w: int | None = None,
    pad_value: float = 128.0,
) -> jax.Array:
    """Resize keeping aspect then pad to (out_h, out_w) with gray.

    Semantics of the reference YOLOv5 preprocess
    (`modules/onnx_utils.py:225-235`): scale = min(W/iw, H/ih), bicubic
    resize, centered paste on a 128-gray canvas. Padding offsets use the
    same floor arithmetic as the reference so `scale_coords` inverts exactly.

    Shapes are static: in/out sizes are Python ints at trace time.
    """
    if in_h is None:
        in_h = img.shape[-3]
    if in_w is None:
        in_w = img.shape[-2]
    scale = min(out_w / in_w, out_h / in_h)
    new_w, new_h = int(in_w * scale), int(in_h * scale)

    x = img.astype(jnp.float32)
    shape = (*img.shape[:-3], new_h, new_w, img.shape[-1])
    resized = jax.image.resize(x, shape, method="cubic", antialias=True)
    if jnp.issubdtype(img.dtype, jnp.integer):
        resized = jnp.clip(jnp.round(resized), 0, 255)

    pad_top = (out_h - new_h) // 2
    pad_left = (out_w - new_w) // 2
    pad_widths = [(0, 0)] * (img.ndim - 3) + [
        (pad_top, out_h - new_h - pad_top),
        (pad_left, out_w - new_w - pad_left),
        (0, 0),
    ]
    out = jnp.pad(resized, pad_widths, constant_values=pad_value)
    return out.astype(img.dtype)


def normalize_uint8(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] -> float [0,1] (reference `models/conv.py:59-60`)."""
    return img.astype(dtype) / jnp.asarray(255.0, dtype=dtype)


def bgr_to_rgb(img: jax.Array) -> jax.Array:
    """Channel flip; reference uses cv2.cvtColor BGR2RGB host-side."""
    return img[..., ::-1]


def hwc_to_chw(img: jax.Array) -> jax.Array:
    """NHWC->NCHW / HWC->CHW for reference-facing output parity only.

    Internally everything stays NHWC (channels minor = TPU lanes); the
    reference emits NCHW crops (`models/conv.py:80`) and CHW pose inputs
    (`pose_est_hrnet_trtserver.py:18`).
    """
    return jnp.moveaxis(img, -1, -3)
