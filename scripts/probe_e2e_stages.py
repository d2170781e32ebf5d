"""Honest per-stage + end-to-end timing of the fused pipeline at batch 32.

Fixes the probe_pipeline_split.py flaw: the accumulator there summed only
the FIRST output leaf, so for the full pipeline XLA dead-code-eliminated
the pose/decode stages and the "FULL fused" number measured detection
only. Here every leaf is summed, so nothing is eliminated.

Compares the vmap(batch-1) detection path against the batch-native
`batch_call` path both standalone and inside the full fused program.
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

    det_vmap = jax.vmap(functools.partial(pipe.backend, pipe.det_vars))
    print(json.dumps({"stage": "det vmap(batch-1)+person slots",
                      "ms": round(timed(det_vmap, images_f32, thresholds), 2)}),
          flush=True)

    det_native = functools.partial(pipe.backend.batch_call, pipe.det_vars)
    print(json.dumps({"stage": "det batch_call+person slots",
                      "ms": round(timed(det_native, images_f32, thresholds), 2)}),
          flush=True)

    def full(im, v, p):
        out = pipe.fused.forward(
            v, p, im.astype(jnp.uint8), thresholds, heights, orig_hw)
        return out.lengths_cm, out.keypoints

    ms = timed(full, images_f32, pipe.det_vars, pipe.pose_vars)
    print(json.dumps({"stage": "FULL fused (batch_call)", "ms": round(ms, 2),
                      "imgs_per_sec": round(B / ms * 1e3, 1)}), flush=True)

    pipe.fused.detector_backend = _NoBatch(pipe.backend)
    ms = timed(full, images_f32, pipe.det_vars, pipe.pose_vars)
    print(json.dumps({"stage": "FULL fused (vmap det)", "ms": round(ms, 2),
                      "imgs_per_sec": round(B / ms * 1e3, 1)}), flush=True)


class _NoBatch:
    """Wrapper hiding batch_call so full.py takes the vmap branch."""

    def __init__(self, backend):
        self._b = backend

    def __call__(self, det_vars, image_f32, det_threshold):
        return self._b(det_vars, image_f32, det_threshold)


if __name__ == "__main__":
    main()
