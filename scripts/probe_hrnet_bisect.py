"""Bisect HRNet-W32 forward time by depth on the real TPU (96 crops).

A Truncated subclass re-declares the same-named modules, so the full
pipeline's pose_vars bind directly; each depth is timed with the
fori_loop + all-leaves-summed methodology."""

import json
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.hrnet import (
    HRNET_W32,
    Bottleneck,
    ConvBN,
    HRModule,
    HRNet,
    Transition,
)

LOOP, TUNNEL_MS = 10, 2.7


class Truncated(HRNet):
    depth: int = 0   # 0 stem, 1 +layer1, 2 +stage2, 3 +stage3, 4 +stage4

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem1", **dt)(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem2", **dt)(x, train)
        if self.depth == 0:
            return x
        for k in range(4):
            x = Bottleneck(cfg.bottleneck_channels,
                           name=f"layer1_{k}", **dt)(x, train)
        if self.depth == 1:
            return x
        xs = [x]
        prev = (cfg.bottleneck_channels * 4,)
        for stage_idx, (n_modules, channels) in enumerate(
            zip(cfg.stage_modules, cfg.branch_channels)
        ):
            xs = Transition(prev, channels,
                            name=f"transition{stage_idx + 2}", **dt)(xs, train)
            for m in range(n_modules):
                xs = HRModule(channels, cfg.blocks_per_branch,
                              name=f"stage{stage_idx + 2}_module{m}",
                              **dt)(xs, train)
            prev = channels
            if self.depth == stage_idx + 2:
                return xs[0]
        return xs[0]


def timed(fn, x):
    def looped(x):
        def body(i, acc):
            out = fn(x + (i % 2).astype(x.dtype))
            return acc + sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
            )
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    prog = jax.jit(looped)
    float(prog(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(x))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP * 1e3 - TUNNEL_MS


def main():
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    pipe = InferencePipeline()
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.random((96, 384, 288, 3)), jnp.float32)

    prev = 0.0
    for depth, label in [(0, "stem"), (1, "+layer1 (4x bottleneck256)"),
                         (2, "+stage2"), (3, "+stage3"), (4, "+stage4")]:
        m = Truncated(config=HRNET_W32, depth=depth)
        ms = timed(lambda c: m.apply(pipe.pose_vars, c), crops)
        print(json.dumps({"depth": label, "cum_ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2)}), flush=True)
        prev = ms
    full = HRNet(config=HRNET_W32)
    ms = timed(lambda c: full.apply(pipe.pose_vars, c), crops)
    print(json.dumps({"depth": "full (+head)", "cum_ms": round(ms, 2),
                      "delta_ms": round(ms - prev, 2)}), flush=True)


if __name__ == "__main__":
    main()
