"""Isolated conv-stack timings for each HRNet branch shape on the TPU.

Chains N_CONVS convs (+BN-style scale/bias+relu) inside a fori_loop and
reads back a scalar. Reveals where HRNet time actually goes and what the
packed rewrite buys per shape."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 48
LOOP = 10
N_CONVS = 8


def time_stack(h, w, cin, cout, kernel=3, stride=1):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, w, cin), jnp.bfloat16)
    # alternate cin->cout / cout->cin so mixed-channel cases chain
    ws = [
        jax.random.normal(
            jax.random.PRNGKey(i),
            (kernel, kernel, cin, cout) if i % 2 == 0
            else (kernel, kernel, cout, cin),
            jnp.bfloat16) * 0.05
        for i in range(N_CONVS)
    ]

    def stack(x, ws):
        def body(i, acc):
            y = x + (i % 2).astype(jnp.bfloat16) * 0.001
            for wk in ws:
                y = jax.lax.conv_general_dilated(
                    y, wk, (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y, 0)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(stack)
    float(prog(x, ws))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(x, ws))
        best = min(best, time.perf_counter() - t0)
    per_conv = best / LOOP / N_CONVS
    flops = 2 * B * (h // stride) * (w // stride) * kernel * kernel * cin * cout
    return per_conv * 1e3, flops / per_conv / 1e12


CASES = [
    ("branch0 canon 3x3x32 @96x72", 96, 72, 32, 32, 3),
    ("branch0 packed 3x3x128 @48x36", 48, 36, 128, 128, 3),
    ("branch1 canon 3x3x64 @48x36", 48, 36, 64, 64, 3),
    ("branch1 packed 3x3x256 @24x18", 24, 18, 256, 256, 3),
    ("branch2 3x3x128 @24x18", 24, 18, 128, 128, 3),
    ("branch3 3x3x256 @12x9", 12, 9, 256, 256, 3),
    ("stem 3x3x64 @96x72", 96, 72, 64, 64, 3),
    ("layer1 1x1 256->64 @96x72", 96, 72, 256, 64, 1),
    ("layer1 1x1 64->256 @96x72", 96, 72, 64, 256, 1),
]

for name, h, w, ci, co, k in CASES:
    ms, tf = time_stack(h, w, ci, co, k)
    print(json.dumps({"case": name, "ms_per_conv": round(ms, 3),
                      "tflops": round(tf, 1)}))
