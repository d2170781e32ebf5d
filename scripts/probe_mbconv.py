"""Is a fused MBConv worth building? Times representative EfficientNet-
Lite4 blocks (expand 1x1 -> depthwise kxk -> project 1x1, inference BN
folded to affine) in plain XLA at batch 32, next to the HBM traffic a
naive materialization model implies.

VERDICT (measured, round 2): no. The composed blocks run at 450-900 GB/s
against the naive traffic model — i.e. XLA is NOT leaving 2x+ bandwidth
on the table, and per-stage decompositions of sub-ms ops are unmeasurable
through the tunnel (launch-share misattribution + the sum-accumulator
folding linear tails). With the pose stage at its MXU-underfill ceiling
and no clear detector slack, a Pallas MBConv fusion was judged
low-confidence/high-cost and NOT built. Keep this probe for re-evaluation
on locally-attached hardware."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LOOP, TUNNEL_MS = 10, 2.7
B = 32

# (label, H, W, Cin, expand, Cout, stride, k) — lite4 @480x640 hot blocks
CASES = [
    ("s1b0 240x320 24->144->32 s2k3", 240, 320, 24, 6, 32, 2, 3),
    ("s1b1 120x160 32->192->32 s1k3", 120, 160, 32, 6, 32, 1, 3),
    ("s2b1 60x80 48->288->48 s1k5", 60, 80, 48, 6, 48, 1, 5),
    ("s4b1 30x40 160->960->160 s1k5", 30, 40, 160, 6, 160, 1, 5),
]


def timed(fn, x, *rest):
    def looped(x, *rest):
        def body(i, acc):
            out = fn(x + (i % 2).astype(x.dtype), *rest)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(looped)
    float(prog(x, *rest))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3 - TUNNEL_MS


def block(x, we, be, wd, bd, wp, bp, *, stride, k):
    e = we.shape[-1]
    h = jax.nn.relu6(
        jax.lax.conv_general_dilated(
            x, we[None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + be
    )
    h = jax.nn.relu6(
        jax.lax.conv_general_dilated(
            h, wd, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=e,
        ) + bd
    )
    h = jax.lax.conv_general_dilated(
        h, wp[None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp
    return h


def main():
    rng = np.random.default_rng(0)
    for label, hh, ww, cin, er, cout, stride, k in CASES:
        e = cin * er
        x = jnp.asarray(rng.normal(0, 1, (B, hh, ww, cin)), jnp.bfloat16)
        we = jnp.asarray(rng.normal(0, 0.1, (cin, e)), jnp.bfloat16)
        be = jnp.asarray(rng.normal(0, 0.1, (e,)), jnp.bfloat16)
        wd = jnp.asarray(rng.normal(0, 0.1, (k, k, 1, e)), jnp.bfloat16)
        bd = jnp.asarray(rng.normal(0, 0.1, (e,)), jnp.bfloat16)
        wp = jnp.asarray(rng.normal(0, 0.1, (e, cout)), jnp.bfloat16)
        bp = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.bfloat16)

        import functools
        fn = functools.partial(block, stride=stride, k=k)
        ms = timed(lambda a, *r: fn(a, *r), x, we, be, wd, bd, wp, bp)
        ho, wo = hh // stride, ww // stride
        exp_mb = B * hh * ww * e * 2 / 1e6
        dwout_mb = B * ho * wo * e * 2 / 1e6
        io_mb = (B * hh * ww * cin + B * ho * wo * cout) * 2 / 1e6
        # materialized path traffic: x + (exp w+r) + (dwout w+r) + out
        total_gb = (io_mb + 2 * exp_mb + 2 * dwout_mb) / 1e3
        print(json.dumps({
            "case": label, "ms": round(ms, 2),
            "traffic_gb": round(total_gb, 2),
            "achieved_gbs": round(total_gb / ms * 1e3, 0),
            "fused_gb": round(io_mb / 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
