"""EfficientNet-Lite backbone family (Flax, NHWC).

The reference's primary person detector is EfficientDet-Lite4 served as an
opaque TF SavedModel inside Triton (`models/conv.py:15`, README model list).
This is a native implementation of its backbone: EfficientNet with the
"Lite" modifications (ReLU6 everywhere, no squeeze-excite, fixed stem/head
while width/depth scale). Lite4 = width 1.4 / depth 1.8.

Returns the three detection feature levels C3 (stride 8), C4 (stride 16),
C5 (stride 32) for the BiFPN.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.layers import ConvBN

relu6 = nn.activation.relu6

# (expand_ratio, channels, repeats, stride, kernel) — EfficientNet-B0 stages
_BASE_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    f = filters * width_mult
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


@dataclasses.dataclass(frozen=True)
class EfficientNetLiteConfig:
    width_mult: float = 1.0
    depth_mult: float = 1.0
    stem_channels: int = 32  # fixed in lite variants
    # upstream checkpoint variable-name prefix (automl convention)
    tf_name: str = "efficientnet-lite0"

    @property
    def stages(self) -> Tuple[Tuple[int, int, int, int, int], ...]:
        out = []
        for i, (e, c, r, s, k) in enumerate(_BASE_STAGES):
            ch = round_filters(c, self.width_mult)
            # lite keeps the first and last stage depths un-scaled
            reps = r if i in (0, len(_BASE_STAGES) - 1) else round_repeats(
                r, self.depth_mult
            )
            out.append((e, ch, reps, s, k))
        return tuple(out)


LITE0 = EfficientNetLiteConfig(1.0, 1.0, tf_name="efficientnet-lite0")
LITE1 = EfficientNetLiteConfig(1.0, 1.1, tf_name="efficientnet-lite1")
LITE2 = EfficientNetLiteConfig(1.1, 1.2, tf_name="efficientnet-lite2")
LITE3 = EfficientNetLiteConfig(1.2, 1.4, tf_name="efficientnet-lite3")
LITE4 = EfficientNetLiteConfig(1.4, 1.8, tf_name="efficientnet-lite4")


class MBConvLite(nn.Module):
    """Mobile inverted bottleneck, lite flavor: ReLU6, no SE."""

    expand_ratio: int
    features: int
    stride: int
    kernel: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        h = x
        # BN eps 1e-3 throughout the EfficientNet family (automl convention;
        # imported checkpoints' moving statistics assume it)
        if self.expand_ratio != 1:
            h = ConvBN(in_ch * self.expand_ratio, 1, 1, act=relu6,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       bn_eps=1e-3, name="expand")(h, train)
        h = ConvBN(h.shape[-1], self.kernel, self.stride,
                   groups=h.shape[-1], act=relu6,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   bn_eps=1e-3, name="depthwise")(h, train)
        h = ConvBN(self.features, 1, 1, act=None,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   bn_eps=1e-3, name="project")(h, train)
        if self.stride == 1 and in_ch == self.features:
            h = h + residual
        return h


class EfficientNetLite(nn.Module):
    """Backbone trunk -> (C3, C4, C5) feature pyramid levels."""

    config: EfficientNetLiteConfig = LITE4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        x = x.astype(self.dtype)
        x = ConvBN(cfg.stem_channels, 3, 2, act=relu6, dtype=self.dtype,
                   param_dtype=self.param_dtype, bn_eps=1e-3,
                   name="stem")(x, train)

        features = []
        for si, (e, c, r, s, k) in enumerate(cfg.stages):
            for bi in range(r):
                x = MBConvLite(
                    e, c, s if bi == 0 else 1, k,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train)
            # C3 after stage 2 (stride 8), C4 after stage 4 (stride 16),
            # C5 after stage 6 (stride 32)
            if si in (2, 4, 6):
                features.append(x)
        return features
