"""YOLOv5 detector (Flax, NHWC) with the v6.0 CSP architecture.

The reference runs YOLOv5m through Triton (`obj_det_yolov5_trtserver.py`)
or yolov5s through onnxruntime on CPU (`obj_det_yolov5_onnx.py`) and does
NMS host-side in torch. Here the network is native Flax and the anchor-grid
decode (reference `obj_det_yolov5_onnx.py:128-172`:
  xy = (2*sigmoid - 0.5 + grid) * stride,  wh = (2*sigmoid)^2 * anchor)
runs in the same jit program, emitting the standard [N, 25200, 85]
prediction tensor (640 input) that feeds `ops.nms.yolo_nms`.

Structure (depth d / width w multiples — s: d=0.33 w=0.50, m: d=0.67
w=0.75): Conv6x6/2 stem; 4 stride-2 stages with C3 blocks (3/6/9/3 base
depths); SPPF; PANet head (top-down + bottom-up C3 stacks); 1x1 Detect
convs to 3 anchors x (5 + 80) per level P3/P4/P5.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.layers import upsample_nearest

silu = nn.silu

# per-level anchor (w, h) pairs, P3/P4/P5 order
# (reference lists the same values P5-first, obj_det_yolov5_onnx.py:130-131)
ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)


@dataclasses.dataclass(frozen=True)
class YoloV5Config:
    depth_mult: float = 0.33
    width_mult: float = 0.50
    num_classes: int = 80

    def width(self, base: int) -> int:
        return int(math.ceil(base * self.width_mult / 8) * 8)

    def depth(self, base: int) -> int:
        return max(1, round(base * self.depth_mult))


YOLOV5S = YoloV5Config(0.33, 0.50)
YOLOV5M = YoloV5Config(0.67, 0.75)
YOLOV5L = YoloV5Config(1.0, 1.0)


class ConvBnSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    # ultralytics pads symmetrically (autopad = k//2, stem overrides 2);
    # "SAME" would shift stride-2 3x3 convs by one pixel vs torch weights
    pad: int | None = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2 if self.pad is None else self.pad
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn",
        )(x)
        return silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = ConvBnSiLU(self.features, 1, name="cv1", **dt)(x, train)
        y = ConvBnSiLU(self.features, 3, name="cv2", **dt)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class C3(nn.Module):
    """CSP bottleneck stack with 3 convs."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c_ = self.features // 2
        a = ConvBnSiLU(c_, 1, name="cv1", **dt)(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, name=f"m{i}", **dt)(a, train)
        b = ConvBnSiLU(c_, 1, name="cv2", **dt)(x, train)
        return ConvBnSiLU(self.features, 1, name="cv3", **dt)(
            jnp.concatenate([a, b], -1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c_ = self.features // 2
        x = ConvBnSiLU(c_, 1, name="cv1", **dt)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnSiLU(self.features, 1, name="cv2", **dt)(
            jnp.concatenate([x, p1, p2, p3], -1), train
        )


class YoloV5(nn.Module):
    """[B, H, W, 3] in [0,1] -> list of 3 raw head tensors
    [B, Hl, Wl, 3*(5+nc)], P3/P4/P5 order."""

    config: YoloV5Config = YOLOV5M
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        w = cfg.width
        d = cfg.depth
        x = x.astype(self.dtype)

        x = ConvBnSiLU(w(64), 6, 2, pad=2, name="stem", **dt)(x, train)
        x = ConvBnSiLU(w(128), 3, 2, name="down1", **dt)(x, train)
        x = C3(w(128), d(3), name="c3_1", **dt)(x, train)
        x = ConvBnSiLU(w(256), 3, 2, name="down2", **dt)(x, train)
        p3 = C3(w(256), d(6), name="c3_2", **dt)(x, train)
        x = ConvBnSiLU(w(512), 3, 2, name="down3", **dt)(p3, train)
        p4 = C3(w(512), d(9), name="c3_3", **dt)(x, train)
        x = ConvBnSiLU(w(1024), 3, 2, name="down4", **dt)(p4, train)
        x = C3(w(1024), d(3), name="c3_4", **dt)(x, train)
        p5 = SPPF(w(1024), name="sppf", **dt)(x, train)

        # PANet top-down
        t5 = ConvBnSiLU(w(512), 1, name="head_cv1", **dt)(p5, train)
        x = jnp.concatenate([upsample_nearest(t5, 2), p4], -1)
        h4 = C3(w(512), d(3), shortcut=False, name="head_c3_1", **dt)(x, train)
        t4 = ConvBnSiLU(w(256), 1, name="head_cv2", **dt)(h4, train)
        x = jnp.concatenate([upsample_nearest(t4, 2), p3], -1)
        out3 = C3(w(256), d(3), shortcut=False, name="head_c3_2", **dt)(x, train)
        # bottom-up
        x = ConvBnSiLU(w(256), 3, 2, name="head_cv3", **dt)(out3, train)
        x = jnp.concatenate([x, t4], -1)
        out4 = C3(w(512), d(3), shortcut=False, name="head_c3_3", **dt)(x, train)
        x = ConvBnSiLU(w(512), 3, 2, name="head_cv4", **dt)(out4, train)
        x = jnp.concatenate([x, t5], -1)
        out5 = C3(w(1024), d(3), shortcut=False, name="head_c3_4", **dt)(x, train)

        na = len(ANCHORS[0])
        no = 5 + cfg.num_classes
        heads = []
        for li, feat in enumerate([out3, out4, out5]):
            y = nn.Conv(
                na * no, (1, 1), dtype=jnp.float32,
                param_dtype=self.param_dtype, name=f"detect{li}",
            )(feat.astype(jnp.float32))
            heads.append(y)
        return heads


def decode_predictions(
    heads: List[jax.Array], num_classes: int = 80
) -> jax.Array:
    """Raw head tensors -> [B, sum(Hl*Wl*3), 5+nc] decoded predictions.

    Grid/anchor math identical to the reference raw-output decode
    (`obj_det_yolov5_onnx.py:144-166`); level order P3, P4, P5.
    """
    no = 5 + num_classes
    outs = []
    for head, stride, anchors in zip(heads, STRIDES, ANCHORS):
        b, h, w, _ = head.shape
        y = head.reshape(b, h, w, len(anchors), no)
        y = jax.nn.sigmoid(y)
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        anc = jnp.asarray(anchors, jnp.float32)  # [3, 2] (w, h)
        xy = jnp.stack(
            [
                (y[..., 0] * 2.0 - 0.5 + gx) * stride,
                (y[..., 1] * 2.0 - 0.5 + gy) * stride,
            ],
            axis=-1,
        )
        wh = (y[..., 2:4] * 2.0) ** 2 * anc[None, None, None, :, :]
        out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        outs.append(out.reshape(b, -1, no))
    return jnp.concatenate(outs, axis=1)


def decode_scored(
    heads: List[jax.Array], num_classes: int = 80
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Raw head tensors -> (boxes_xywh [B,N,4], obj [B,N],
    best_cls [B,N] i32, best_logit [B,N]): the class reduction done on
    LOGITS, before any sigmoid.

    Produces results identical to `decode_predictions` + the
    `ops.nms.yolo_nms` score math, cheaper: sigmoid is strictly
    monotonic, so argmax/max over the 80 class channels commute with it
    — `argmax_j sigmoid(l_j)*sigmoid(obj) == argmax_j l_j` and
    `max_j sigmoid(l_j)*sigmoid(obj) == sigmoid(max_j l_j)*sigmoid(obj)`
    (the obj factor is common and positive). The [N, 85] sigmoid
    prediction tensor (~8.6 MB f32/image at 640) is never materialized;
    only 8 reduced channels per anchor are. Downstream consumes the
    identical floats: the best-class sigmoid IS computed, just once
    instead of 80 times. Reference score semantics:
    `modules/onnx_utils.py:125-222` best-class branch.

    Measured on v5e (fused yolov5m e2e, b32, tunnel methodology):
    NEUTRAL — 93.5 ms classic vs 94.2 ms scored, within run noise; XLA
    already fused the wide sigmoid + reductions into one pass, so the
    avoided materialization was never on the critical path. Kept as the
    serving path for the strictly smaller live-tensor footprint (matters
    at larger batches / smaller VMEM), with the classic
    `decode_predictions` retained for the CLI ONNX-parity surface.
    """
    no = 5 + num_classes
    boxes, objs, best_cs, best_ls = [], [], [], []
    for head, stride, anchors in zip(heads, STRIDES, ANCHORS):
        b, h, w, _ = head.shape
        y = head.reshape(b, h, w, len(anchors), no)
        box = jax.nn.sigmoid(y[..., :4])
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        anc = jnp.asarray(anchors, jnp.float32)  # [3, 2] (w, h)
        xy = jnp.stack(
            [
                (box[..., 0] * 2.0 - 0.5 + gx) * stride,
                (box[..., 1] * 2.0 - 0.5 + gy) * stride,
            ],
            axis=-1,
        )
        wh = (box[..., 2:4] * 2.0) ** 2 * anc[None, None, None, :, :]
        cls_logits = y[..., 5:]
        boxes.append(jnp.concatenate([xy, wh], -1).reshape(b, -1, 4))
        objs.append(jax.nn.sigmoid(y[..., 4]).reshape(b, -1))
        best_cs.append(
            jnp.argmax(cls_logits, axis=-1).astype(jnp.int32).reshape(b, -1)
        )
        best_ls.append(jnp.max(cls_logits, axis=-1).reshape(b, -1))
    return (
        jnp.concatenate(boxes, axis=1),
        jnp.concatenate(objs, axis=1),
        jnp.concatenate(best_cs, axis=1),
        jnp.concatenate(best_ls, axis=1),
    )
