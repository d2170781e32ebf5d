"""Does int8 pay on this chip's convs? Measures conv throughput for the
HRNet-shaped workloads in bf16 vs int8 (preferred_element_type=int32) and
a bf16-in/int8-weights mixed mode, plus an int8 dot as the MXU upper
bound. Decides whether a quantized serving path is worth building."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 30
TUNNEL_MS = 2.7


def timed(fn, *args):
    def looped(x, *rest):
        def body(i, acc):
            out = fn(x + (i % 2).astype(x.dtype), *rest)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(looped)
    float(prog(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(*args))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3 - TUNNEL_MS


def conv(x, w, pe=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pe,
    )


def main():
    rng = np.random.default_rng(0)
    # HRNet branch-0 shaped: 96 crops at 96x72, 32ch, 3x3
    for b, h, w, c in [(96, 96, 72, 32), (96, 48, 36, 64)]:
        x8 = jnp.asarray(rng.integers(-127, 127, (b, h, w, c)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
        xbf = x8.astype(jnp.bfloat16)
        wbf = w8.astype(jnp.bfloat16)
        flops = 2 * b * h * w * 9 * c * c

        ms = timed(lambda a: conv(a, wbf), xbf)
        print(json.dumps({"case": f"bf16 conv {b}x{h}x{w}x{c}",
                          "ms": round(ms, 3),
                          "tflops": round(flops / ms / 1e9, 1)}), flush=True)
        try:
            ms = timed(lambda a: conv(a, w8, jnp.int32), x8)
            print(json.dumps({"case": f"int8 conv {b}x{h}x{w}x{c}",
                              "ms": round(ms, 3),
                              "tflops": round(flops / ms / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"int8 conv {b}x{h}x{w}x{c}",
                              "error": str(e)[:200]}), flush=True)

    # MXU bound check: big int8 vs bf16 dot
    m = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    flops = 2 * m**3
    ms = timed(lambda a: jax.lax.dot(a, b8.astype(jnp.bfloat16)),
               a8.astype(jnp.bfloat16))
    print(json.dumps({"case": "bf16 dot 4096", "ms": round(ms, 3),
                      "tflops": round(flops / ms / 1e9, 1)}), flush=True)
    try:
        ms = timed(
            lambda a: jax.lax.dot(a, b8, preferred_element_type=jnp.int32),
            a8)
        print(json.dumps({"case": "int8 dot 4096", "ms": round(ms, 3),
                          "tops": round(flops / ms / 1e9, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": "int8 dot 4096",
                          "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
