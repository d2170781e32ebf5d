"""MobileNetV1-SSD person detector (the reference's edge-CPU alternative).

The reference ships this as a quantized tflite blob executed by the TFLite
C++ runtime (`modules/human_detector.py`, weights checked in at
`modules/mnetv1_sdd_tflite/ssd.tflite` — ssd_mobilenet_v1 COCO, depth
multiplier 0.75, 300x300 uint8, BN folded). Here the same network is a
native Flax model whose weights are DEQUANTIZED out of that exact blob by
`models/tflite_import.py`, making it the framework's only slot with real
pretrained weights available offline.

Structure: Conv0 (3x3 s2) + 13 depthwise-separable blocks (relu6), SSD
extra layers off Conv13 (4x {1x1 squeeze, 3x3 s2}), and 6 box/class
predictor pairs over feature maps [19^2, 10^2, 5^2, 3^2, 2^2, 1^2] with
[3, 6, 6, 6, 6, 6] anchors/cell = 1917 anchors. Postprocess mirrors the
TFLite_Detection_PostProcess custom op: faster-rcnn box decode with scales
(10, 10, 5, 5) against the blob's anchor table, sigmoid scores, background
class 0 dropped, class-wise NMS to 10 slots.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.ops import nms as nms_ops

relu6 = nn.activation.relu6

# (pointwise_channels, stride) per depthwise block, BASE depth (multiplier
# 1.0); the checked-in blob uses multiplier 0.75
_MOBILENET_BLOCKS = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),  # blocks 1..11
    (1024, 2), (1024, 1),                               # blocks 12, 13
)
# SSD extra layers: (squeeze_1x1, out_3x3) base channels
_EXTRA_LAYERS = ((256, 512), (128, 256), (128, 256), (64, 128))
ANCHORS_PER_CELL = (3, 6, 6, 6, 6, 6)
NUM_CLASSES_WITH_BG = 91
BOX_SCALES = (10.0, 10.0, 5.0, 5.0)  # y, x, h, w


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    depth_multiplier: float = 0.75
    num_classes_with_bg: int = NUM_CLASSES_WITH_BG
    input_size: int = 300

    def depth(self, base: int) -> int:
        return max(8, int(base * self.depth_multiplier + 0.5) // 8 * 8)


SSD_MOBILENET_V1_075 = SSDConfig(0.75)


class _Conv(nn.Module):
    """Conv + bias (+ relu6): BN is pre-folded in the source blob."""

    features: int
    kernel: int = 1
    stride: int = 1
    depthwise: bool = False
    act: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=groups, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        return relu6(x) if self.act else x


class SSDMobileNetV1(nn.Module):
    """uint8/float [B, 300, 300, 3] -> (box_regs [B,1917,4], logits
    [B,1917,91])."""

    config: SSDConfig = SSD_MOBILENET_V1_075
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = images.astype(jnp.float32)
        x = (x - 128.0) / 128.0  # tflite input quantization (zp 128, 1/128)
        x = x.astype(self.dtype)

        x = _Conv(cfg.depth(32), 3, 2, name="conv0", **dt)(x)
        feats: List[jax.Array] = []
        for i, (ch, stride) in enumerate(_MOBILENET_BLOCKS, start=1):
            x = _Conv(x.shape[-1], 3, stride, depthwise=True,
                      name=f"dw{i}", **dt)(x)
            x = _Conv(cfg.depth(ch), 1, 1, name=f"pw{i}", **dt)(x)
            if i == 11:
                feats.append(x)   # 19x19
        feats.append(x)           # 10x10 (conv13)

        for j, (squeeze, out) in enumerate(_EXTRA_LAYERS, start=2):
            x = _Conv(cfg.depth(squeeze), 1, 1, name=f"extra{j}_1x1", **dt)(x)
            x = _Conv(cfg.depth(out), 3, 2, name=f"extra{j}_3x3", **dt)(x)
            feats.append(x)

        boxes, logits = [], []
        b = images.shape[0]
        for li, (f, na) in enumerate(zip(feats, ANCHORS_PER_CELL)):
            br = _Conv(na * 4, 1, act=False, name=f"box{li}",
                       dtype=jnp.float32, param_dtype=self.param_dtype)(
                f.astype(jnp.float32))
            cl = _Conv(na * cfg.num_classes_with_bg, 1, act=False,
                       name=f"cls{li}", dtype=jnp.float32,
                       param_dtype=self.param_dtype)(f.astype(jnp.float32))
            boxes.append(br.reshape(b, -1, 4))
            logits.append(cl.reshape(b, -1, cfg.num_classes_with_bg))
        return jnp.concatenate(boxes, 1), jnp.concatenate(logits, 1)


class SSDDetections(NamedTuple):
    boxes: jax.Array    # [N, 4] normalized (y1, x1, y2, x2)
    classes: jax.Array  # [N] 0-based, background dropped (person == 0)
    scores: jax.Array   # [N]
    valid: jax.Array    # [N] bool


def ssd_postprocess(
    box_regs: jax.Array,      # [1917, 4]
    logits: jax.Array,        # [1917, 91]
    anchors_ycxhw: jax.Array,  # [1917, 4] from the blob
    score_threshold: float = 1e-8,
    iou_threshold: float = 0.6,
    max_detections: int = 10,
    top_k: int = 128,
) -> SSDDetections:
    """TFLite_Detection_PostProcess semantics, fixed-shape."""
    ya, xa, ha, wa = jnp.split(anchors_ycxhw, 4, axis=-1)
    ty, tx, th, tw = jnp.split(box_regs, 4, axis=-1)
    ycenter = ty / BOX_SCALES[0] * ha + ya
    xcenter = tx / BOX_SCALES[1] * wa + xa
    h = jnp.exp(th / BOX_SCALES[2]) * ha
    w = jnp.exp(tw / BOX_SCALES[3]) * wa
    boxes_yxyx = jnp.concatenate(
        [ycenter - h / 2, xcenter - w / 2, ycenter + h / 2, xcenter + w / 2],
        axis=-1,
    )

    scores_all = jax.nn.sigmoid(logits[:, 1:])  # drop background class 0
    best_score = jnp.max(scores_all, axis=-1)
    best_class = jnp.argmax(scores_all, axis=-1)
    masked = jnp.where(best_score > score_threshold, best_score, 0.0)

    boxes_xyxy = boxes_yxyx[:, jnp.array([1, 0, 3, 2])]
    res = nms_ops.nms_fixed(
        boxes_xyxy, masked, iou_threshold=iou_threshold,
        max_det=max_detections, top_k=top_k,
        classes=best_class.astype(jnp.float32), class_agnostic=False,
    )
    return SSDDetections(
        boxes=res.boxes[:, jnp.array([1, 0, 3, 2])],
        classes=res.classes,
        scores=res.scores,
        valid=res.valid,
    )
