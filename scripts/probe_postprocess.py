"""Detector-postprocess stage timings at batch 32 on the real TPU."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models import efficientdet as edet
from human_body_proportion_estimation_tpu.ops import nms as nms_ops
from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
    nms_sweep_pallas_batched,
)

B, LOOP = 32, 10
TUNNEL_MS = 2.7
HW = (480, 640)
CFG = edet.EFFICIENTDET_LITE4


def timed(fn, x, *rest):
    def looped(x, *rest):
        def body(i, acc):
            out = fn(x + (i % 2).astype(x.dtype), *rest)
            return acc + jnp.sum(
                jax.tree.leaves(out)[0].astype(jnp.float32)
            ) + sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(out)[1:])
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
    rng = np.random.default_rng(0)
    anchors = edet.generate_anchors(CFG.anchors, *HW)
    n = anchors.shape[0]
    print(json.dumps({"anchors": int(n)}), flush=True)
    logits = jnp.asarray(rng.normal(-2, 1, (B, n, CFG.num_classes)),
                         jnp.float32)
    regs = jnp.asarray(rng.normal(0, 0.3, (B, n, 4)), jnp.float32)

    full = jax.vmap(lambda l, r: edet.postprocess(l, r, HW, CFG, top_k=128))
    print(json.dumps({"stage": "edet_postprocess b32",
                      "ms": round(timed(full, logits, regs), 2)}), flush=True)

    def scoring(l):
        s = jax.nn.sigmoid(l)
        return jnp.max(s, -1), jnp.argmax(s, -1)
    print(json.dumps({"stage": "sigmoid+max+argmax",
                      "ms": round(timed(scoring, logits), 2)}), flush=True)

    def score_then_topk(l):
        s = jnp.max(jax.nn.sigmoid(l), -1)
        return jax.lax.top_k(s, 128)
    print(json.dumps({"stage": "scoring+topk128",
                      "ms": round(timed(score_then_topk, logits), 2)}),
          flush=True)

    boxes = jnp.asarray(rng.random((B, 128, 4)), jnp.float32) * 400
    boxes = boxes.at[..., 2:].add(boxes[..., :2])
    scores = jnp.asarray(np.sort(rng.random((B, 128)))[:, ::-1], jnp.float32)
    xla_nms = jax.vmap(lambda b, s: nms_ops.nms_mask(b, s, 0.5))
    print(json.dumps({"stage": "xla nms_mask sweep b32x128",
                      "ms": round(timed(xla_nms, boxes, scores), 2)}),
          flush=True)
    print(json.dumps({"stage": "pallas nms sweep b32x128",
                      "ms": round(timed(
                          lambda b, s: nms_sweep_pallas_batched(b, s, 0.5),
                          boxes, scores), 2)}), flush=True)


if __name__ == "__main__":
    main()
