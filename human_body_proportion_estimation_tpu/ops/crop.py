"""Person-crop extraction: crop_and_resize with TF semantics, on the MXU.

The reference fuses the det->pose handoff into a TF graph via
`tf.image.crop_and_resize` to (384, 288) (`models/conv.py:59-70`). Those
semantics (corner-aligned sampling over normalized y1x1y2x2 boxes, bilinear,
zero extrapolation) are reproduced here, but formulated as two dense
matmuls per crop instead of gathers: bilinear interpolation along an axis is
a linear map, so a crop is ``Wy @ image @ Wx^T`` with interpolation-weight
matrices Wy [crop_h, H] and Wx [crop_w, W]. Gathers land on the TPU's scalar
path; matmuls ride the 128x128 MXU — for 3 fixed crop slots per image this
keeps the whole det->pose hop inside one fused XLA program with zero host
round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(
    lo: jax.Array, hi: jax.Array, out_size: int, in_size: int
) -> jax.Array:
    """Bilinear sampling weights [out_size, in_size] for one axis.

    TF crop_and_resize maps output index i to input coordinate
        scale  = (hi-lo) * (in-1) / (out-1)
        pos(i) = lo*(in-1) + i * scale          (out > 1)
        pos    = 0.5*(lo+hi)*(in-1)             (out == 1)
    (corner-aligned). The f32 operation order matches TF's kernel exactly so
    edge rows round identically. The bilinear kernel is the hat function
    max(0, 1-|pos - j|), which is exactly the interpolation matrix row.
    Out-of-range positions produce all-zero rows = extrapolation value 0,
    matching TF's extrapolation_value default.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    if out_size > 1:
        scale = (hi - lo) * (in_size - 1) / (out_size - 1)
        pos = lo * (in_size - 1) + i * scale
    else:
        pos = 0.5 * (lo + hi) * (in_size - 1) + i * 0.0
    j = jnp.arange(in_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - j[None, :]))
    # positions outside [0, in-1] by more than 1 already give 0 via the hat;
    # positions within (-1, 0) or (in-1, in) would half-sample the edge pixel,
    # TF extrapolates instead -> zero those rows entirely.
    in_range = (pos >= 0.0) & (pos <= in_size - 1)
    return w * in_range[:, None]


def crop_and_resize(
    image: jax.Array,
    boxes_yxyx: jax.Array,
    crop_h: int,
    crop_w: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Crop N normalized boxes from one image and resize bilinearly.

    Args:
        image: [H, W, C] float.
        boxes_yxyx: [N, 4] normalized (y1, x1, y2, x2); may exceed [0,1],
            out-of-image samples read as 0 (TF extrapolation_value=0).
        crop_h, crop_w: static output size (384, 288 in the pipeline).
        precision: matmul precision. HIGHEST (default) is f32-exact vs TF;
            HIGH (bf16x3 passes) measures 4e-5 max error on [0,1] images
            at 1.7x speed (the fused pipeline's choice — see full.py);
            DEFAULT uses bf16 inputs (~0.7% pixel error, ~3.9x faster) —
            acceptable when feeding a bf16 network, not for parity tests.

    Returns:
        [N, crop_h, crop_w, C] float32.

    Parity target: `tf.image.crop_and_resize` as used in reference
    `models/conv.py:67-70` (verified against TF in tests).
    """
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)

    def one_crop(box):
        wy = _axis_weights(box[0], box[2], crop_h, h)   # [crop_h, H]
        wx = _axis_weights(box[1], box[3], crop_w, w)   # [crop_w, W]
        # Precision.HIGHEST: TPU matmuls default to bf16 inputs, which costs
        # ~1% error on interpolation weights; the crop feeds keypoint
        # localization, so keep it f32-exact (still MXU, 3-pass).
        tmp = jnp.einsum(
            "yh,hwc->ywc", wy, img,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return jnp.einsum(
            "xw,ywc->yxc", wx, tmp,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return jax.vmap(one_crop)(boxes_yxyx.astype(jnp.float32))
