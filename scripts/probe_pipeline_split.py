"""Per-stage timing of the fused pipeline at batch 32 on the real TPU.

Times each sub-program (detector / crop / pose / decode+geometry) and the
whole fused program, canonical vs packed pose, with the fori_loop +
readback methodology. The loop body's FIRST array argument is perturbed
with the loop index so nothing is loop-invariant-hoisted; the ~2.7 ms/iter
tunnel launch share is subtracted."""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models.hrnet import HRNet, HRNET_W32
from human_body_proportion_estimation_tpu.pipeline.full import FusedPipeline
from human_body_proportion_estimation_tpu.pipeline.host import InferencePipeline

B, LOOP = 32, 10
TUNNEL_MS = 2.7


def timed(fn, x, *rest):
    """fn(x, *rest); x perturbed per iteration (same dtype/scale trick as
    bench.py so the loop body cannot be hoisted)."""

    def looped(x, *rest):
        def body(i, acc):
            eps = (i % 2).astype(x.dtype)
            out = fn(x + eps, *rest)
            # sum EVERY leaf: consuming only the first output leaf lets
            # XLA dead-code-eliminate the stages feeding the others
            # (this bug once produced a fictitious "617 imgs/s")
            return acc + sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
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
    print(json.dumps({"stage": "detector+nms (EDet-Lite4 b32)",
                      "ms": round(timed(det, images_f32, thresholds), 2)}),
          flush=True)

    raw = lambda imgs: pipe.backend.detector.apply(pipe.det_vars, imgs)
    print(json.dumps({"stage": "detector raw fwd",
                      "ms": round(timed(raw, images_f32), 2)}), flush=True)

    from human_body_proportion_estimation_tpu.ops import crop as crop_ops
    boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.9, 0.9]], jnp.float32),
                     (B, 3, 1)).reshape(B, 3, 4)
    crop = jax.vmap(lambda img, bx: crop_ops.crop_and_resize(
        img, bx, cfg.pose.crop_height, cfg.pose.crop_width))
    print(json.dumps({"stage": "crop 3x 384x288",
                      "ms": round(timed(crop, images_f32 / 255.0, boxes), 2)}),
          flush=True)

    crops = jnp.asarray(rng.random((B * 3, 384, 288, 3)), jnp.float32)
    for name, packed in [("canonical", False), ("packed", True)]:
        pose = HRNet(config=HRNET_W32, packed_branch0=packed)
        ms = timed(lambda c: pose.apply(pipe.pose_vars, c), crops)
        print(json.dumps({"stage": f"pose 96 crops ({name})",
                          "ms": round(ms, 2)}), flush=True)

    for name, packed in [("canonical", False), ("packed", True)]:
        pose = HRNet(config=HRNET_W32, packed_branch0=packed)
        fused = FusedPipeline(cfg, pipe.backend, pose)
        ms = timed(lambda im, v, p: fused.forward(
            v, p, im.astype(jnp.uint8), thresholds, heights, orig_hw),
            images_f32, pipe.det_vars, pipe.pose_vars)
        print(json.dumps({"stage": f"FULL fused b32 ({name})",
                          "ms": round(ms, 2),
                          "imgs_per_sec": round(B / ms * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
