"""Probe crop_and_resize variants at pipeline scale (96 crops, 480x640).

The shipped crop formulates bilinear resampling as two dense matmuls
(ops/crop.py): exact vs TF, but the interpolation-weight matrices have at
most 2 nonzeros per row, so the dense H-axis contraction does 480 MACs
where 2 suffice. Variants probed here (all at the fused pipeline's real
shapes — 32 images x 3 slots, 480x640 -> 384x288):

  matmul_highest   shipped default (f32-exact, Precision.HIGHEST)
  matmul_default   bf16 inputs (documented ~0.7% pixel error)
  gather_lerp_h    H axis as row-gather + f32 lerp (exact: adding zero
                   terms is exact in f32), W axis keeps the matmul
  gather_lerp_hw   both axes gather+lerp (W gathers are strided — expect
                   the scalar path to lose)

fori_loop + value-readback methodology (see bench.py docstring).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.ops import crop as crop_ops

B, P, LOOP = 32, 3, 10
H, W, CH, CW = 480, 640, 384, 288
TUNNEL_MS = 2.7


def _axis_pos(lo, hi, out_size, in_size):
    i = jnp.arange(out_size, dtype=jnp.float32)
    scale = (hi - lo) * (in_size - 1) / (out_size - 1)
    pos = lo * (in_size - 1) + i * scale
    in_range = (pos >= 0.0) & (pos <= in_size - 1)
    return pos, in_range


def gather_lerp_h(image, boxes, crop_h, crop_w):
    """H axis: gather the two neighbor rows + lerp; W axis: matmul."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)

    def one_crop(box):
        pos, ok = _axis_pos(box[0], box[2], crop_h, h)
        lo = jnp.clip(jnp.floor(pos), 0, h - 1)
        frac = pos - lo
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, h - 1)
        rows_lo = jnp.take(img, lo_i, axis=0)      # [crop_h, W, C]
        rows_hi = jnp.take(img, hi_i, axis=0)
        rows = rows_lo * (1.0 - frac)[:, None, None] \
            + rows_hi * frac[:, None, None]
        rows = rows * ok[:, None, None]
        wx = crop_ops._axis_weights(box[1], box[3], crop_w, w)
        return jnp.einsum(
            "xw,ywc->yxc", wx, rows,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return jax.vmap(one_crop)(boxes.astype(jnp.float32))


def gather_lerp_hw(image, boxes, crop_h, crop_w):
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)

    def one_crop(box):
        posy, oky = _axis_pos(box[0], box[2], crop_h, h)
        loy = jnp.clip(jnp.floor(posy), 0, h - 1)
        fy = posy - loy
        ly = loy.astype(jnp.int32)
        hy = jnp.minimum(ly + 1, h - 1)
        rows = jnp.take(img, ly, axis=0) * (1 - fy)[:, None, None] \
            + jnp.take(img, hy, axis=0) * fy[:, None, None]
        rows = rows * oky[:, None, None]

        posx, okx = _axis_pos(box[1], box[3], crop_w, w)
        lox = jnp.clip(jnp.floor(posx), 0, w - 1)
        fx = posx - lox
        lx = lox.astype(jnp.int32)
        hx = jnp.minimum(lx + 1, w - 1)
        cols = jnp.take(rows, lx, axis=1) * (1 - fx)[None, :, None] \
            + jnp.take(rows, hx, axis=1) * fx[None, :, None]
        return cols * okx[None, :, None]

    return jax.vmap(one_crop)(boxes.astype(jnp.float32))


def looped(fn):
    def run(imgs, boxes):
        def body(i, acc):
            out = fn(imgs + (i % 2).astype(imgs.dtype), boxes)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, LOOP, body, 0.0)
    return run


def measure(name, fn, imgs, boxes):
    prog = jax.jit(looped(fn))
    float(prog(imgs, boxes))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(imgs, boxes))
        best = min(best, time.perf_counter() - t0)
    ms = best / LOOP * 1e3 - TUNNEL_MS
    print(json.dumps({"variant": name, "ms_per_batch": round(ms, 2)}),
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.sort(rng.uniform(0.0, 1.0, (B, P, 2, 2)), axis=2)
        .transpose(0, 1, 3, 2).reshape(B, P, 4).astype(np.float32)
    )  # y1x1y2x2 with y1<y2, x1<x2

    def batched(cropfn, **kw):
        def f(ims, bxs):
            return jax.vmap(
                lambda im, bx: cropfn(im, bx, CH, CW, **kw)
            )(ims, bxs)
        return f

    # numeric agreement first (CPU-cheap, one small run on device)
    a = batched(crop_ops.crop_and_resize)(imgs[:2], boxes[:2])
    g = batched(lambda im, bx, ch, cw: gather_lerp_h(im, bx, ch, cw))(
        imgs[:2], boxes[:2])
    err = float(jnp.max(jnp.abs(a - g)))
    print(json.dumps({"check": "gather_lerp_h max |err| vs matmul",
                      "err": err}), flush=True)

    measure("matmul_highest", batched(crop_ops.crop_and_resize), imgs, boxes)
    measure(
        "matmul_default",
        batched(functools.partial(
            crop_ops.crop_and_resize,
            precision=jax.lax.Precision.DEFAULT)),
        imgs, boxes,
    )
    measure("gather_lerp_h",
            batched(lambda im, bx, ch, cw: gather_lerp_h(im, bx, ch, cw)),
            imgs, boxes)
    measure("gather_lerp_hw",
            batched(lambda im, bx, ch, cw: gather_lerp_hw(im, bx, ch, cw)),
            imgs, boxes)


if __name__ == "__main__":
    from human_body_proportion_estimation_tpu.utils import compile_cache

    compile_cache.enable()
    main()
