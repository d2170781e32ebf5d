"""Pallas TPU kernels for the pipeline's fused postprocessing ops.

`decode_heatmaps_pallas` fuses the heatmap -> keypoint decode (argmax over
each K x Hm x Wm map, (x, y) recovery, zero-masking — reference
`modules/pose_estimator.py:75-99`) into one VMEM-resident kernel per person
slot: the [K, Hm*Wm] block is reduced on the VPU without materializing the
intermediate index arrays in HBM. Grid = person slots; each program reads
one slot's heatmaps (17 x 96 x 72 f32 ≈ 470 KB, comfortably within the
~16 MB VMEM budget) and writes the [K, 2] keypoints + [K] scores.

The jnp implementation (`ops/heatmap.decode_heatmaps`) remains the
reference; parity is asserted in tests (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(hm_ref, kp_ref, score_ref):
    """One person slot: hm [1, K, H, W] -> kp [1, K, 2], scores [1, K, 1].

    Mosaic rejects the (H, W) -> H*W shape cast, so argmax is restated as
    pure reductions: the minimum row-major linear index among positions
    equal to the map maximum — which is also exactly numpy's
    first-occurrence argmax tie-break (reference pose_estimator.py:88).
    """
    _, k, h, w = hm_ref.shape
    hm = hm_ref[0]                                   # [K, H, W]
    scores = jnp.max(jnp.max(hm, axis=-1), axis=-1)  # [K]
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 2)
    )
    big = jnp.int32(h * w)
    at_max = hm >= scores[:, None, None]
    idx = jnp.min(
        jnp.min(jnp.where(at_max, lin, big), axis=-1), axis=-1
    )                                                # [K]
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    mask = (scores > 0.0).astype(jnp.float32)
    kp_ref[0, :, 0] = x * mask
    kp_ref[0, :, 1] = y * mask
    score_ref[0, :, 0] = scores


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_heatmaps_pallas(
    heatmaps: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """[N, K, H, W] f32 heatmaps -> ([N, K, 2] keypoints, [N, K] scores).

    Drop-in replacement for `ops.heatmap.decode_heatmaps` on 4D input.
    """
    n, k, h, w = heatmaps.shape
    kp, scores = pl.pallas_call(
        _decode_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, k, 1), jnp.float32),
        ],
        interpret=interpret,
    )(heatmaps.astype(jnp.float32))
    return kp, scores[..., 0]
