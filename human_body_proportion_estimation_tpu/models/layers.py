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


class PackedBasicBlock(nn.Module):
    """`BasicBlock` executing packed->packed (see `PackedConvBN`); same
    variable tree ('conv1'/'conv2'). HRNet branch blocks never change
    channels or stride, so no downsample path exists here."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == 4 * self.features, (
            f"packed input expected 4x{self.features} channels, "
            f"got {x.shape[-1]}"
        )
        y = PackedConvBN(self.features, "inner", dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv1")(x, train)
        y = PackedConvBN(self.features, "inner", act=None, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv2")(y, train)
        return nn.relu(y + x)


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


class _ConvParams(nn.Module):
    """Parameter holder matching `nn.Conv`'s tree ({'kernel'[, 'bias']})
    so packed modules stay checkpoint-compatible with their canonical
    counterparts."""

    shape: tuple
    param_dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape,
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.shape[-1],),
                self.param_dtype,
            )
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter holder matching `nn.BatchNorm`'s tree (params scale/bias,
    batch_stats mean/var); returns the folded inference-mode (mul, add)."""

    features: int
    epsilon: float
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), self.param_dtype),
        ).value
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), self.param_dtype),
        ).value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        return mul, bias - mean * mul


class PackedConvBN(nn.Module):
    """ConvBN executing in the 2x2 space-to-depth packed domain.

    Parameters live in CANONICAL shapes under the same names as `ConvBN`
    ('conv'/'bn') — the same variable tree serves both modules, so
    checkpoints, importers and converters are untouched; only the traced
    computation differs. The kernel is reparametrized at trace time via
    `ops/s2d.py` (exact; see that module's docstring for why this is the
    TPU-native answer to HRNet's 32-channel high-res branch).

    `mode`: 'inner' (packed->packed 3x3 s1), 'producer' (unpacked->packed,
    canonical 3x3 s1), 'consumer' (packed->unpacked half-res, canonical
    3x3 s2), 'producer1x1' (canonical 1x1 + upsample pair; caller halves
    the upsample factor). Inference-only (serving path): BN always uses
    running stats.
    """

    features: int              # canonical out-channels
    mode: str
    act: Callable | None = nn.relu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            raise NotImplementedError(
                "PackedConvBN is a serving-path reparametrization; train "
                "with the canonical ConvBN and the same variable tree"
            )
        from human_body_proportion_estimation_tpu.ops import s2d

        packed_in = self.mode in ("inner", "consumer")
        cin = x.shape[-1] // 4 if packed_in else x.shape[-1]
        ksize = 1 if self.mode == "producer1x1" else 3
        kernel, _ = _ConvParams(
            (ksize, ksize, cin, self.features), self.param_dtype,
            name="conv",
        )()
        kp = s2d.PACKERS[self.mode](kernel)
        strides, padding = s2d.CONV_SPECS[self.mode]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp.astype(self.dtype),
            window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mul, add = _BNParams(self.features, self.bn_eps, self.param_dtype,
                             name="bn")()
        if self.mode != "consumer":   # packed output: tile stats per slot
            mul = s2d.tile_channel_vector(mul)
            add = s2d.tile_channel_vector(add)
        y = y * mul.astype(self.dtype) + add.astype(self.dtype)
        if self.act is not None:
            y = self.act(y)
        return y


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
