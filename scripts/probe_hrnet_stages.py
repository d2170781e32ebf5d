"""Truncated HRNet stage timings (canonical vs packed) on the real TPU.

Identifies where the full model's time goes; subtracts the ~2.7 ms/iter
share of the tunnel launch tax measured by probe_conv_shapes.py."""

import json
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.hrnet import (
    HRNET_W32,
    HRModule,
    HRNet,
    Transition,
)
from human_body_proportion_estimation_tpu.models.layers import Bottleneck, ConvBN

B, LOOP, H, W = 48, 10, 384, 288
TUNNEL_MS = 2.7


class Trunc(HRNet):
    upto: str = "head"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        packed = self.packed_branch0 and not train
        x = x.astype(self.dtype)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem1", **dt)(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem2", **dt)(x, train)
        if self.upto == "stem":
            return x
        for k in range(4):
            x = Bottleneck(cfg.bottleneck_channels,
                           name=f"layer1_{k}", **dt)(x, train)
        if self.upto == "layer1":
            return x
        xs = [x]
        prev = (cfg.bottleneck_channels * 4,)
        for si, (n_modules, channels) in enumerate(
            zip(cfg.stage_modules, cfg.branch_channels)
        ):
            xs = Transition(
                prev, channels,
                packed_branch0_out=packed, name=f"transition{si + 2}", **dt
            )(xs, train)
            for m in range(n_modules):
                xs = HRModule(
                    channels, cfg.blocks_per_branch, packed_branch0=packed,
                    name=f"stage{si + 2}_module{m}", **dt
                )(xs, train)
            prev = channels
            if self.upto == f"stage{si + 2}":
                return xs[0]
        return xs[0]


def bench(model, v, x):
    def looped(v, x):
        def body(i, acc):
            out = model.apply(v, x + (i % 2).astype(x.dtype) * 1e-3)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(looped)
    float(prog(v, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(v, x))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3 - TUNNEL_MS


def main():
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    for upto in ["stem", "layer1", "stage2", "stage3", "stage4"]:
        for pk in ([False] if upto in ("stem", "layer1") else [False, True]):
            m = Trunc(config=HRNET_W32, upto=upto, packed_branch0=pk)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                v = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32))
            v = jax.device_put(v, jax.devices()[0])
            ms = bench(m, v, x)
            print(json.dumps({"upto": upto, "packed": pk, "ms": round(ms, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
