"""Decompose the 17 ms detector-postprocess gap at batch 32 on the TPU.

Each case runs the REAL EfficientDet forward first (so head-output layouts
match the fused program exactly) and then a postprocess variant; raw
forward time is printed for subtraction. All output leaves are summed
(no DCE)."""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models import efficientdet as edet
from human_body_proportion_estimation_tpu.ops import nms as nms_ops
from human_body_proportion_estimation_tpu.pipeline.full import select_persons
from human_body_proportion_estimation_tpu.pipeline.host import InferencePipeline

B, LOOP = 32, 10
TUNNEL_MS = 2.7
HW = (480, 640)


def timed(fn, x, *rest):
    def looped(x, *rest):
        def body(i, acc):
            out = fn(x + (i % 2).astype(x.dtype), *rest)
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
    images_f32 = jnp.asarray(rng.integers(
        0, 256, (B, cfg.detector.input_height, cfg.detector.input_width, 3),
        np.uint8)).astype(jnp.float32)
    thresholds = jnp.full((B,), 0.7, jnp.float32)
    fwd = lambda im: pipe.backend.detector.apply(pipe.det_vars, im)
    econf = pipe.backend.detector.config
    anchors = jnp.asarray(edet.generate_anchors(econf.anchors, *HW))

    base = timed(fwd, images_f32)
    print(json.dumps({"case": "raw fwd", "ms": round(base, 2)}), flush=True)

    def scoring(im):
        cls, box = fwd(im)
        s = jax.nn.sigmoid(cls)
        return jnp.max(s, -1), jnp.argmax(s, -1), box

    ms = timed(scoring, images_f32)
    print(json.dumps({"case": "fwd+sigmoid/max/argmax",
                      "ms": round(ms - base, 2)}), flush=True)

    def with_topk(im):
        best, bcls, box = scoring(im)
        return jax.lax.top_k(best, 128), bcls.sum(), box.sum()

    ms = timed(with_topk, images_f32)
    print(json.dumps({"case": "... + exact top_k 128",
                      "ms": round(ms - base, 2)}), flush=True)

    def with_approx(im):
        best, bcls, box = scoring(im)
        return jax.lax.approx_max_k(best, 128), bcls.sum(), box.sum()

    ms = timed(with_approx, images_f32)
    print(json.dumps({"case": "... + approx_max_k 128",
                      "ms": round(ms - base, 2)}), flush=True)

    def full_post(im):
        cls, box = fwd(im)
        def one(c, b, t):
            bx, sc, cl, va = edet.postprocess(
                c, b, HW, econf, iou_threshold=cfg.detector.iou_threshold,
                top_k=cfg.detector.nms_top_k)
            return select_persons(bx, sc, cl, va, t,
                                  cfg.detector.person_class_id, 3)
        return jax.vmap(one)(cls, box, thresholds)

    ms = timed(full_post, images_f32)
    print(json.dumps({"case": "full postprocess+slots (current)",
                      "ms": round(ms - base, 2)}), flush=True)


if __name__ == "__main__":
    main()
