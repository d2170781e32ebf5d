"""Canonical vs space-to-depth-packed HRNet-W32 forward on the real TPU.

Same fori_loop + value-readback timing as bench.py (block_until_ready lies
through the axon tunnel). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_hrnet_packed.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models.hrnet import HRNet, HRNET_W32

CROPS = 48          # batch-16 pipeline load (3 person slots)
LOOP_ITERS = 10
TRIALS = 3
H, W = 384, 288
GFLOPS_PER_CROP = 16.0  # HRNet-W32 @ 384x288


def time_model(model, v, x):
    def looped(v, x):
        def body(i, acc):
            out = model.apply(v, x + (i % 2).astype(x.dtype) * 1e-3)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, LOOP_ITERS, body, 0.0)

    prog = jax.jit(looped)
    float(prog(v, x))
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(prog(v, x))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP_ITERS


def main():
    canon = HRNet(config=HRNET_W32)
    packed = HRNet(config=HRNET_W32, packed_branch0=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v = canon.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, H, W, 3), jnp.float32))
    dev = jax.devices()[0]
    v = jax.device_put(v, dev)
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((CROPS, H, W, 3)),
                    jnp.float32), dev)

    for name, model in [("canonical", canon), ("packed", packed)]:
        t = time_model(model, v, x)
        tf = CROPS * GFLOPS_PER_CROP / t / 1e3
        print(json.dumps({
            "variant": name,
            "ms_per_batch48": round(t * 1e3, 2),
            "ms_per_crop": round(t * 1e3 / CROPS, 3),
            "effective_tflops": round(tf, 1),
        }))


if __name__ == "__main__":
    main()
