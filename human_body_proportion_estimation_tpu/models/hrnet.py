"""HRNet top-down pose estimation model (Flax, NHWC, bf16 on the MXU).

The reference serves an opaque HRNet/HigherHRNet engine inside Triton and
only touches its I/O contract: input [B, 3, 384, 288] RGB in [0,1]
(`pose_est_hrnet_trtserver.py:15-19`), output 17 COCO-keypoint heatmaps
[B, 17, 96, 72] named "output" (`pose_est_hrnet_trtserver.py:22-28`,
`person_det_pose_edet4_trtserver.py:23`). This module implements the
standard HRNet-W32/W48 pose architecture (Sun et al., CVPR'19 "Deep
High-Resolution Representation Learning") natively in Flax so the forward
pass jit-compiles into the fused pipeline program:

  stem (2x stride-2 3x3)  -> 1/4 resolution
  layer1: 4 bottlenecks   -> 256 ch
  stage2: 2 branches [W, 2W],        1 module  x 4 basic blocks
  stage3: 3 branches [W, 2W, 4W],    4 modules x 4 basic blocks
  stage4: 4 branches [W..8W],        3 modules x 4 basic blocks
  head: 1x1 conv -> num_keypoints heatmaps on the 1/4-res branch

Multi-resolution fusion: every module ends with a full exchange — each
output branch sums transformed versions of all input branches (1x1 conv +
nearest-upsample for coarser, chained stride-2 3x3 convs for finer).

I/O convention here is NHWC ([B, 384, 288, 3] -> [B, 96, 72, 17]); the
pipeline transposes only at the reference-parity surface.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

import jax

from human_body_proportion_estimation_tpu.models.layers import (
    BasicBlock,
    Bottleneck,
    ConvBN,
    PackedConvBN,
    upsample_nearest,
)


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    width: int = 32                 # W32 / W48
    num_keypoints: int = 17
    stage_modules: Tuple[int, int, int] = (1, 4, 3)   # stages 2,3,4
    blocks_per_branch: int = 4
    stem_channels: int = 64
    bottleneck_channels: int = 64   # layer1, expansion 4 -> 256 out

    @property
    def branch_channels(self) -> Tuple[Tuple[int, ...], ...]:
        w = self.width
        return ((w, 2 * w), (w, 2 * w, 4 * w), (w, 2 * w, 4 * w, 8 * w))


HRNET_W32 = HRNetConfig(width=32)
HRNET_W48 = HRNetConfig(width=48)


class FuseLayer(nn.Module):
    """Full multi-resolution exchange across branches.

    `packed_branch0`: branch 0 tensors are 2x2 space-to-depth packed
    (see ops/s2d.py) — up-paths INTO branch 0 emit packed via tiled 1x1
    kernels + half-factor upsample, and the first step of every down-path
    OUT of branch 0 consumes packed via a 2x2 stride-1 kernel. Exact
    reparametrization over the same variable tree."""

    channels: Sequence[int]
    dtype: Any
    param_dtype: Any
    packed_branch0: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    y = xs[j]
                elif j > i:
                    # coarser -> finer: 1x1 conv + BN, nearest upsample 2^(j-i)
                    if i == 0 and self.packed_branch0:
                        y = PackedConvBN(
                            self.channels[0], "producer1x1", act=None,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"up_{j}_{i}",
                        )(xs[j], train)
                        if j - i > 1:
                            y = upsample_nearest(y, 2 ** (j - i - 1))
                    else:
                        y = ConvBN(
                            self.channels[i], 1, 1, act=None, torch_pad=True,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"up_{j}_{i}",
                        )(xs[j], train)
                        y = upsample_nearest(y, 2 ** (j - i))
                else:
                    # finer -> coarser: chained stride-2 3x3 convs; ReLU
                    # between steps, none on the last (official HRNet).
                    y = xs[j]
                    for step in range(i - j):
                        last = step == i - j - 1
                        feats = self.channels[i] if last else self.channels[j]
                        if j == 0 and step == 0 and self.packed_branch0:
                            y = PackedConvBN(
                                feats, "consumer",
                                act=None if last else nn.relu,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"down_{j}_{i}_{step}",
                            )(y, train)
                        else:
                            y = ConvBN(
                                feats, 3, 2, torch_pad=True,
                                act=None if last else nn.relu,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"down_{j}_{i}_{step}",
                            )(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    """One HRNet module: per-branch basic blocks, then fusion."""

    channels: Sequence[int]
    num_blocks: int
    dtype: Any
    param_dtype: Any
    packed_branch0: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from human_body_proportion_estimation_tpu.models.layers import (
            PackedBasicBlock,
        )

        ys = []
        for b, ch in enumerate(self.channels):
            y = xs[b]
            block = (
                PackedBasicBlock if b == 0 and self.packed_branch0
                else BasicBlock
            )
            for k in range(self.num_blocks):
                y = block(
                    ch, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"branch{b}_block{k}",
                )(y, train)
            ys.append(y)
        return FuseLayer(
            self.channels, self.dtype, self.param_dtype,
            packed_branch0=self.packed_branch0, name="fuse"
        )(ys, train)


class Transition(nn.Module):
    """Grow the branch set between stages; new branch = stride-2 conv of
    the coarsest, existing branches get a 3x3 conv only on channel change."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    dtype: Any
    param_dtype: Any
    # when packing branch 0, the only adapt conv that can exist on branch
    # 0 is the stage-2 transition's 256->W (unpacked input): it becomes
    # the packed-domain producer (4x4 stride-2 kernel emitting packed
    # directly); later transitions never change branch-0 channels
    packed_branch0_out: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, ch in enumerate(self.out_channels):
            if i < len(self.in_channels):
                if self.in_channels[i] != ch:
                    if i == 0 and self.packed_branch0_out:
                        outs.append(
                            PackedConvBN(
                                ch, "producer", dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"adapt_{i}")(xs[i], train)
                        )
                    else:
                        outs.append(
                            ConvBN(ch, 3, 1, torch_pad=True, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"adapt_{i}")(xs[i], train)
                        )
                else:
                    outs.append(xs[i])
            else:
                outs.append(
                    ConvBN(ch, 3, 2, torch_pad=True, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"new_{i}")(xs[-1], train)
                )
        return outs


class HRNet(nn.Module):
    """Pose HRNet: [B, H, W, 3] in [0,1] -> [B, H/4, W/4, K] heatmaps."""

    config: HRNetConfig = HRNET_W32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Run the high-res branch 2x2 space-to-depth packed (W -> 4W channels
    # at half resolution) — exact reparametrization over the SAME variable
    # tree that fills the 128-wide MXU instead of 1/4 of it (ops/s2d.py).
    # Serving-path only (BN uses running stats); default off so training,
    # converters and parity oracles see the canonical graph.
    packed_branch0: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        packed = self.packed_branch0 and not train
        x = x.astype(self.dtype)

        # torch_pad: symmetric padding like the official pose_hrnet convs
        # (matters for the stride-2 stem; "SAME" would shift by one pixel)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem1", **dt)(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem2", **dt)(x, train)

        for k in range(4):
            x = Bottleneck(
                cfg.bottleneck_channels, name=f"layer1_{k}", **dt
            )(x, train)

        xs = [x]
        prev_channels: Sequence[int] = (cfg.bottleneck_channels * 4,)
        for stage_idx, (n_modules, channels) in enumerate(
            zip(cfg.stage_modules, cfg.branch_channels)
        ):
            xs = Transition(
                prev_channels, channels,
                packed_branch0_out=packed,
                name=f"transition{stage_idx + 2}", **dt
            )(xs, train)
            for m in range(n_modules):
                xs = HRModule(
                    channels, cfg.blocks_per_branch, packed_branch0=packed,
                    name=f"stage{stage_idx + 2}_module{m}", **dt
                )(xs, train)
            prev_channels = channels

        # head on the highest-resolution branch; f32 logits for stable argmax
        if packed:
            from human_body_proportion_estimation_tpu.models.layers import (
                _ConvParams,
            )
            from human_body_proportion_estimation_tpu.ops import s2d

            kernel, bias = _ConvParams(
                (1, 1, cfg.branch_channels[-1][0], cfg.num_keypoints),
                self.param_dtype, use_bias=True, name="head",
            )()
            kp = s2d.pack_pointwise_blockdiag(kernel).astype(jnp.float32)
            out = jax.lax.conv_general_dilated(
                xs[0].astype(jnp.float32), kp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = out + s2d.tile_channel_vector(bias).astype(jnp.float32)
            return s2d.depth_to_space(out)
        out = nn.Conv(
            cfg.num_keypoints, (1, 1), dtype=jnp.float32,
            param_dtype=self.param_dtype, name="head",
        )(xs[0].astype(jnp.float32))
        return out


def create_hrnet(name: str = "hrnet_w32", **kwargs) -> HRNet:
    cfg = {"hrnet_w32": HRNET_W32, "hrnet_w48": HRNET_W48}[name]
    return HRNet(config=cfg, **kwargs)
