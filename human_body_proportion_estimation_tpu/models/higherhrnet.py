"""HigherHRNet pose model (Flax, NHWC).

The reference serves "higherhrnet" as an alternative pose engine whose
heatmap output tensor is named "output_2"
(`pose_est_hrnet_trtserver.py:22-28`). HigherHRNet (Cheng et al., CVPR'20)
is HRNet plus a higher-resolution deconv head: the 1/4-res branch emits
heatmaps+associative-embedding tags, then a 4x4 stride-2 transposed conv
over [features, heatmaps] followed by residual blocks emits 1/2-res
heatmaps — the tensor the reference consumes.

Outputs: dict with
  "output_1": [B, H/4, W/4, 2K] (K heatmaps + K AE tags, train-time head)
  "output_2": [B, H/2, W/2, K]  (the higher-resolution heatmaps)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.hrnet import (
    HRNET_W32,
    HRNetConfig,
)
from human_body_proportion_estimation_tpu.models.layers import (
    BasicBlock,
    ConvBN,
)


class HigherHRNet(nn.Module):
    """[B, H, W, 3] in [0,1] -> {"output_1", "output_2"}."""

    config: HRNetConfig = HRNET_W32
    num_deconv_blocks: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        from human_body_proportion_estimation_tpu.models.hrnet import (
            Bottleneck,
            HRModule,
            Transition,
        )

        cfg = self.config
        k = cfg.num_keypoints
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)

        # shared HRNet trunk (same layer naming as models/hrnet.py so a
        # single weight converter covers both)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem1", **dt)(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, torch_pad=True,
                   name="stem2", **dt)(x, train)
        for i in range(4):
            x = Bottleneck(
                cfg.bottleneck_channels, name=f"layer1_{i}", **dt
            )(x, train)
        xs = [x]
        prev = (cfg.bottleneck_channels * 4,)
        for stage_idx, (n_modules, channels) in enumerate(
            zip(cfg.stage_modules, cfg.branch_channels)
        ):
            xs = Transition(
                prev, channels, name=f"transition{stage_idx + 2}", **dt
            )(xs, train)
            for m in range(n_modules):
                xs = HRModule(
                    channels, cfg.blocks_per_branch,
                    name=f"stage{stage_idx + 2}_module{m}", **dt
                )(xs, train)
            prev = channels
        feat = xs[0]  # [B, H/4, W/4, W]

        # head 1: heatmaps + AE tags at 1/4
        out1 = nn.Conv(
            2 * k, (1, 1), dtype=jnp.float32, param_dtype=self.param_dtype,
            name="head1",
        )(feat.astype(jnp.float32))

        # deconv to 1/2 over [features, heatmaps+tags]
        d = jnp.concatenate([feat, out1.astype(self.dtype)], axis=-1)
        d = nn.ConvTranspose(
            cfg.width, (4, 4), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="deconv",
        )(d)
        d = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="deconv_bn",
        )(d)
        d = nn.relu(d)
        for i in range(self.num_deconv_blocks):
            d = BasicBlock(cfg.width, name=f"deconv_block{i}", **dt)(d, train)

        out2 = nn.Conv(
            k, (1, 1), dtype=jnp.float32, param_dtype=self.param_dtype,
            name="head2",
        )(d.astype(jnp.float32))
        return {"output_1": out1, "output_2": out2}


class HigherHRNetHeatmaps(nn.Module):
    """HigherHRNet exposed through the plain-heatmap contract the top-down
    pipeline and pose CLI consume: returns only the 1/2-res "output_2"
    heatmaps [B, H/2, W/2, K] (the tensor the reference reads,
    pose_est_hrnet_trtserver.py:22-28)."""

    config: HRNetConfig = HRNET_W32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return HigherHRNet(
            self.config, dtype=self.dtype, param_dtype=self.param_dtype,
            name="higher",
        )(x, train)["output_2"]
