"""Shared Flax building blocks for the model zoo.

TPU conventions used throughout the model zoo:
  * NHWC layout — channels on the minor (lane) dimension.
  * bfloat16 compute / float32 params by default; XLA fuses the BN + ReLU
    elementwise tails into the preceding conv.
  * BatchNorm always runs in inference mode (use_running_average) — this is
    a serving framework; training utilities override via `train=True`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Callable | None = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_bn: bool = True
    # torch-family models (HRNet) use 1e-5; the EfficientNet/EfficientDet
    # family uses 1e-3 — must match for imported pretrained weights
    bn_eps: float = 1e-5
    # padding semantics: "SAME" (TF — asymmetric for stride 2) vs torch's
    # symmetric (k-1)//2. Identical for stride 1 / odd kernels, DIFFERENT
    # for stride-2 convs: torch-family models must set torch_pad=True or
    # imported pretrained weights see inputs shifted by one pixel.
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(p, p), (p, p)] if self.torch_pad else "SAME",
            feature_group_count=self.groups,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """ResNet basic block (two 3x3 convs), HRNet stage blocks."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # torch_pad: these blocks exist for the torch-family models (HRNet)
        y = ConvBN(self.features, 3, self.stride, torch_pad=True,
                   dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, act=None, torch_pad=True,
                   dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv2")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, 1, self.stride, act=None,
                              torch_pad=True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4), HRNet layer1."""

    features: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_features = self.features * self.expansion
        y = ConvBN(self.features, 1, 1, torch_pad=True, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, self.stride, torch_pad=True,
                   dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv2")(y, train)
        y = ConvBN(out_features, 1, 1, act=None, torch_pad=True,
                   dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(out_features, 1, self.stride, act=None,
                              torch_pad=True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="downsample")(x, train)
        return nn.relu(y + residual)


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor spatial upsample by an integer factor (NHWC)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)


class SeparableConvBN(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 with BN (+ optional act) — the
    EfficientDet-Lite BiFPN / head conv."""

    features: int
    act: Callable | None = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch, (3, 3), padding="SAME", feature_group_count=in_ch,
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x
