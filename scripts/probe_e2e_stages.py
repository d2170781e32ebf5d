"""Honest per-stage + end-to-end timing of the fused pipeline at batch 32.

All output leaves are summed so XLA cannot dead-code-eliminate any stage
(probe_pipeline_split.py's original first-leaf accumulator produced
fictitious numbers). The batch-native `batch_call` detector experiment
this script once compared was measured ≈ equal to vmap(batch-1) end to
end and REMOVED (it also broke CPU-mesh bit-identity certification; see
BENCHMARKS.md) — only the surviving vmap path is probed here.
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


def timed(fn, x, *rest):
    def looped(x, *rest):
        def body(i, acc):
            eps = (i % 2).astype(x.dtype)
            out = fn(x + eps, *rest)
            return acc + sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(out)
            )
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(looped)
    float(prog(x, *rest))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3 - TUNNEL_MS


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

    det = jax.vmap(functools.partial(pipe.backend, pipe.det_vars))
    print(json.dumps({"stage": "det fwd+post+slots b32",
                      "ms": round(timed(det, images_f32, thresholds), 2)}),
          flush=True)

    crops = jnp.asarray(rng.random((B * 3, 384, 288, 3)), jnp.float32)
    ms = timed(lambda c: pipe.pose.apply(pipe.pose_vars, c), crops)
    print(json.dumps({"stage": "pose fwd 96 crops", "ms": round(ms, 2)}),
          flush=True)

    def full(im, v, p):
        out = pipe.fused.forward(
            v, p, im.astype(jnp.uint8), thresholds, heights, orig_hw)
        return out.lengths_cm, out.keypoints

    ms = timed(full, images_f32, pipe.det_vars, pipe.pose_vars)
    print(json.dumps({"stage": "FULL fused b32", "ms": round(ms, 2),
                      "imgs_per_sec": round(B / ms * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
