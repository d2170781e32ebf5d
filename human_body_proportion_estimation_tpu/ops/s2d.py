"""Space-to-depth (2x2) channel packing for small-channel convolutions.

Why this exists: the TPU MXU is a 128x128 systolic array. HRNet-W32's
high-resolution branch runs 3x3 convs with 32 in/out channels at 96x72 —
each MXU pass contracts only 32 of 128 rows and writes only 32 of 128
columns, ~1/16 utilization (measured 1.4 TFLOP/s vs 64+ for 256-channel
convs, BENCHMARKS.md). Packing 2x2 spatial blocks into channels runs the
same branch as 128-channel convs at half resolution: 4x the nominal FLOPs
(the packed kernels are block-sparse) but ~16x the MXU utilization — a
~4x net win on the branch that dominates HRNet latency.

All transforms here are EXACT reparametrizations (same real-number
arithmetic, reassociated): a canonical conv applied to `x` equals the
packed conv applied to `space_to_depth(x)` up to float rounding, including
the zero-padding borders. Each packing function maps a canonical HWIO
kernel to the packed-domain kernel; the model keeps its canonical
parameter tree (checkpoints, importers and converters are untouched) and
applies these transforms at trace time — the transform einsums are
weight-sized and vanish next to the conv FLOPs.

Packed layout convention (slot-major): packed channel index
``(a * 2 + b) * C + c`` holds original pixel offset ``(a, b)`` of channel
``c`` within each 2x2 block.

Derivations (output pixel (2i+a, 2j+b), kernel tap (dh, dw), SAME pad):
  * inner  — 3x3 stride-1, packed in -> packed out: reading original row
    ``2i+a+dh-1 = 2(i+p)+a'`` gives ``(p, a') = divmod(a+dh-1, 2)`` with
    ``p in {-1,0,1}`` -> a 3x3 packed kernel over 4C -> 4Co channels.
  * producer — 3x3 stride-1, unpacked in -> packed out: original rows
    ``2i-1 .. 2i+2`` -> a 4x4 stride-2 kernel, pad (1,1).
  * consumer — 3x3 stride-2, packed in -> unpacked out at half res:
    original rows ``2i-1, 2i, 2i+1`` live in packed rows ``i-1, i`` ->
    a 2x2 stride-1 kernel, pad (1,0).
  * pointwise producer — 1x1 conv followed by nearest-upsample 2^k
    (HRNet fuse up-path): in packed domain the 2x2 block is constant, so
    tile the kernel 4x along out-channels and upsample by 2^(k-1).
  * pointwise blockdiag — 1x1 conv packed in -> packed out (HRNet head):
    block-diagonal 4C -> 4Co kernel; invert with depth_to_space.

There is no reference analog to cite: the reference runs these convs on a
GPU through Triton/TF (SURVEY section 2.2) where cuDNN handles small
channel counts; this transform is the TPU-native answer to the same
workload shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], slot-major packed channels."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """[N, H, W, 4C] -> [N, 2H, 2W, C] (inverse of `space_to_depth`)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


@functools.lru_cache()
def _inner_map() -> np.ndarray:
    """M[p+1, q+1, A, B, dh, dw] for the packed 3x3 stride-1 kernel."""
    m = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for a in range(2):
        for b in range(2):
            slot_out = a * 2 + b
            for dh in range(3):
                for dw in range(3):
                    rp, ra = divmod(a + dh - 1, 2)
                    cp, cb = divmod(b + dw - 1, 2)
                    m[rp + 1, cp + 1, ra * 2 + cb, slot_out, dh, dw] = 1.0
    return m


@functools.lru_cache()
def _producer_map() -> np.ndarray:
    """M[ph, pw, B, dh, dw] for the 4x4 stride-2 producer kernel."""
    m = np.zeros((4, 4, 4, 3, 3), np.float32)
    for a in range(2):
        for b in range(2):
            for dh in range(3):
                for dw in range(3):
                    m[a + dh, b + dw, a * 2 + b, dh, dw] = 1.0
    return m


@functools.lru_cache()
def _consumer_map() -> np.ndarray:
    """M[ph, pw, A, dh, dw] for the 2x2 stride-1 consumer kernel."""
    m = np.zeros((2, 2, 4, 3, 3), np.float32)
    for ap in range(2):
        for bp in range(2):
            for ph in range(2):
                for pw in range(2):
                    dh = 2 * ph + ap - 1
                    dw = 2 * pw + bp - 1
                    if 0 <= dh <= 2 and 0 <= dw <= 2:
                        m[ph, pw, ap * 2 + bp, dh, dw] = 1.0
    return m


def pack_inner3x3(w: jax.Array) -> jax.Array:
    """Canonical [3,3,C,Co] stride-1 kernel -> packed [3,3,4C,4Co].

    Apply with stride 1, padding SAME ((1,1),(1,1)) on the packed tensor.
    """
    c, co = w.shape[2], w.shape[3]
    kp = jnp.einsum("pqABhw,hwio->pqAiBo", jnp.asarray(_inner_map()), w)
    return kp.reshape(3, 3, 4 * c, 4 * co)


def pack_producer3x3(w: jax.Array) -> jax.Array:
    """Canonical [3,3,Cin,Co] stride-1 kernel -> [4,4,Cin,4Co] producing
    the packed output directly from the unpacked input.

    Apply with stride 2, padding ((1,1),(1,1))."""
    cin, co = w.shape[2], w.shape[3]
    kp = jnp.einsum("pqBhw,hwio->pqiBo", jnp.asarray(_producer_map()), w)
    return kp.reshape(4, 4, cin, 4 * co)


def pack_consumer3x3_s2(w: jax.Array) -> jax.Array:
    """Canonical [3,3,C,Co] stride-2 kernel -> [2,2,4C,Co] consuming the
    packed input and emitting the unpacked half-resolution output.

    Apply with stride 1, padding ((1,0),(1,0))."""
    c, co = w.shape[2], w.shape[3]
    kp = jnp.einsum("pqAhw,hwio->pqAio", jnp.asarray(_consumer_map()), w)
    return kp.reshape(2, 2, 4 * c, co)


def pack_pointwise_tiled(w: jax.Array) -> jax.Array:
    """Canonical [1,1,Cin,Co] kernel of a (1x1 conv -> 2^k nearest
    upsample) pair -> [1,1,Cin,4Co] emitting packed output; follow with a
    2^(k-1) nearest upsample in the packed domain."""
    return jnp.tile(w, (1, 1, 1, 4))


def pack_pointwise_blockdiag(w: jax.Array) -> jax.Array:
    """Canonical [1,1,C,Co] kernel -> [1,1,4C,4Co] block-diagonal packed
    pointwise kernel (packed in -> packed out)."""
    c, co = w.shape[2], w.shape[3]
    kp = jnp.einsum("AB,hwio->hwAiBo", jnp.eye(4, dtype=w.dtype), w)
    return kp.reshape(1, 1, 4 * c, 4 * co)


def tile_channel_vector(v: jax.Array) -> jax.Array:
    """Per-channel vector [C] (BN stats, bias) -> packed [4C]."""
    return jnp.tile(v, 4)


# (strides, padding) each packed kernel must be applied with
CONV_SPECS = {
    "inner": ((1, 1), ((1, 1), (1, 1))),
    "producer": ((2, 2), ((1, 1), (1, 1))),
    "consumer": ((1, 1), ((1, 0), (1, 0))),
    "producer1x1": ((1, 1), ((0, 0), (0, 0))),
}

PACKERS = {
    "inner": pack_inner3x3,
    "producer": pack_producer3x3,
    "consumer": pack_consumer3x3_s2,
    "producer1x1": pack_pointwise_tiled,
}
