"""Roofline analysis of the fused pipeline's stages on the real TPU.

For each stage: measured ms (fori_loop + value-readback, ALL output leaves
accumulated so XLA cannot dead-code-eliminate anything) next to XLA's own
compiled cost model (FLOPs + HBM bytes accessed via
`compiled.cost_analysis()`), giving achieved TFLOP/s and GB/s against the
v5e peaks (~197 TFLOP/s bf16, ~819 GB/s HBM). A stage whose achieved GB/s
approaches the HBM peak is bandwidth-bound: its time is the roofline
ceiling for this architecture regardless of MXU utilization.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.pipeline.host import InferencePipeline

B, LOOP = 32, 10
TUNNEL_MS = 2.7
PEAK_TFLOPS_BF16 = 197.0
PEAK_GBS = 819.0


def looped(fn):
    def run(x, *rest):
        def body(i, acc):
            eps = (i % 2).astype(x.dtype)
            out = fn(x + eps, *rest)
            return acc + sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
            )
        return jax.lax.fori_loop(0, LOOP, body, 0.0)
    return run


def analyze(name, fn, x, *rest):
    prog = jax.jit(looped(fn))
    lowered = prog.lower(x, *rest)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) / LOOP
    bytes_ = float(ca.get("bytes accessed", 0.0)) / LOOP
    float(prog(x, *rest))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(x, *rest))
        best = min(best, time.perf_counter() - t0)
    ms = best / LOOP * 1e3 - TUNNEL_MS
    sec = ms / 1e3
    print(json.dumps({
        "stage": name,
        "ms": round(ms, 2),
        "gflops": round(flops / 1e9, 1),
        "hbm_gb": round(bytes_ / 1e9, 3),
        "achieved_tflops": round(flops / sec / 1e12, 1),
        "achieved_gbs": round(bytes_ / sec / 1e9, 1),
        "pct_flops_peak": round(flops / sec / 1e12 / PEAK_TFLOPS_BF16 * 100, 1),
        "pct_hbm_peak": round(bytes_ / sec / 1e9 / PEAK_GBS * 100, 1),
    }), flush=True)
    return ms


def main():
    pipe = InferencePipeline()
    cfg = pipe.config
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 256, (B, cfg.detector.input_height, cfg.detector.input_width, 3),
        np.uint8))
    thresholds = jnp.full((B,), 0.7, jnp.float32)
    heights = jnp.full((B, 3), 175.0, jnp.float32)
    orig_hw = jnp.full((B, 2), 640.0, jnp.float32)
    images_f32 = images.astype(jnp.float32)

    # detector raw forward (both heads consumed)
    raw = lambda imgs: pipe.backend.detector.apply(pipe.det_vars, imgs)
    analyze("det raw fwd b32", raw, images_f32)

    # detector incl. postprocess + person slots (vmapped, the fused path)
    det = jax.vmap(functools.partial(pipe.backend, pipe.det_vars))
    analyze("det fwd+post+slots b32", det, images_f32, thresholds)

    # pose forward, 96 crops
    crops = jnp.asarray(rng.random((B * 3, 384, 288, 3)), jnp.float32)
    analyze("pose fwd 96 crops", lambda c: pipe.pose.apply(pipe.pose_vars, c),
            crops)

    # crop stage
    from human_body_proportion_estimation_tpu.ops import crop as crop_ops
    boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.9, 0.9]], jnp.float32),
                     (B, 3, 1)).reshape(B, 3, 4)
    crop = jax.vmap(lambda img, bx: crop_ops.crop_and_resize(
        img, bx, cfg.pose.crop_height, cfg.pose.crop_width))
    analyze("crop 3x b32", crop, images_f32 / 255.0, boxes)

    # full fused
    def full(im, v, p):
        out = pipe.fused.forward(
            v, p, im.astype(jnp.uint8), thresholds, heights, orig_hw)
        return out.lengths_cm, out.keypoints
    ms = analyze("FULL fused b32", full, images_f32,
                 pipe.det_vars, pipe.pose_vars)
    print(json.dumps({"imgs_per_sec": round(B / ms * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
