"""EfficientDet-Lite detector (Flax, NHWC): backbone + BiFPN + heads +
fixed-shape postprocess.

Replaces the reference's opaque `edetlite4` TF SavedModel served by Triton
(`models/conv.py:15-18`, README model repo). Its output contract is kept:
  detection_boxes  [100, 4] pixel yxyx,
  detection_scores [100],
  detection_classes[100] 1-based COCO ids (person == 1.0, conv.py:22)
so the fused pipeline's person-filter/top-3 stage consumes identical
tensors. Architecture: EfficientNet-Lite4 trunk, BiFPN (224 ch x 7 repeats,
unweighted-sum fusion, ReLU6 — the lite flavor), 4-repeat separable-conv
class/box heads over P3..P7, 9 anchors/cell, sigmoid scores, class-wise NMS
via the shared fixed-shape `ops.nms`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from human_body_proportion_estimation_tpu.models.anchors import (
    AnchorConfig,
    decode_boxes,
    generate_anchors,
)
from human_body_proportion_estimation_tpu.models.efficientnet_lite import (
    LITE0,
    LITE4,
    EfficientNetLite,
    EfficientNetLiteConfig,
    relu6,
)
from human_body_proportion_estimation_tpu.models.layers import (
    ConvBN,
    SeparableConvBN,
)
from human_body_proportion_estimation_tpu.ops import nms as nms_ops


@dataclasses.dataclass(frozen=True)
class EfficientDetConfig:
    backbone: EfficientNetLiteConfig = LITE4
    fpn_channels: int = 224
    fpn_repeats: int = 7
    head_repeats: int = 4
    num_classes: int = 90
    anchors: AnchorConfig = dataclasses.field(default_factory=AnchorConfig)
    max_detections: int = 100


EFFICIENTDET_LITE4 = EfficientDetConfig()
EFFICIENTDET_LITE0 = EfficientDetConfig(
    backbone=LITE0, fpn_channels=64, fpn_repeats=3, head_repeats=3
)


def _maxpool2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class ResampleDown(nn.Module):
    """1x1 channel adapt + stride-2 maxpool (P5 -> P6 -> P7).

    Matches automl's pre-cell `resample_p6` (conv+BN only when the channel
    count differs, then pooling); `resample_p7` is pool-only.
    """

    features: int
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.features:
            x = ConvBN(self.features, 1, 1, act=None, bn_eps=1e-3,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adapt")(x, train)
        return _maxpool2(x)


class BiFPNLayer(nn.Module):
    """One bidirectional FPN pass (top-down then bottom-up), sum fusion.

    Lite models replace the weighted fast-attention fusion with plain sums
    (quantization-friendly); each fused node is relu6 -> separable conv+BN.

    Node/resample topology mirrors the automl fnode graph so pretrained
    checkpoints map 1:1: backbone features enter the FIRST cell raw, and
    every node that consumes a feature whose channel count differs applies
    its OWN 1x1 conv+BN resample (automl `fpn_cells/cell_0/fnode*/
    resample_*`) — in particular the top-down and bottom-up consumers of
    raw P4/P5 each hold separate resample weights.
    """

    features: int
    dtype: Any
    param_dtype: Any

    def _node(self, name):
        return SeparableConvBN(
            self.features, act=None, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

    def _resample(self, x, name, train):
        """Per-node input adapt: 1x1 conv+BN iff channels differ."""
        if x.shape[-1] == self.features:
            return x
        return ConvBN(
            self.features, 1, 1, act=None, bn_eps=1e-3, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )(x, train)

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        n = len(feats)  # P3..P7
        # top-down: P6' = conv(relu6(P6 + up(P7))) ... down to P3'
        td = [None] * n
        td[n - 1] = feats[n - 1]
        for i in range(n - 2, -1, -1):
            # nearest-resize to the exact target level shape: with non-even
            # level dims (e.g. 480 input -> P5 15x20, P6 8x10) a fixed
            # factor-2 upsample overshoots by one row/col
            up = jax.image.resize(
                td[i + 1], td[i + 1].shape[:1] + feats[i].shape[1:3]
                + td[i + 1].shape[3:], method="nearest",
            )
            lat = self._resample(feats[i], f"td_resample_{i}", train)
            td[i] = self._node(f"td_{i}")(relu6(lat + up), train)
        # bottom-up: P4'' = conv(relu6(P4 + P4' + down(P3'')))
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            down = _maxpool2(out[i - 1])
            s = td[i] + down
            if i < n - 1:
                # original skip (not at the ends), separately resampled
                s = s + self._resample(feats[i], f"bu_resample_{i}", train)
            out[i] = self._node(f"bu_{i}")(relu6(s), train)
        return out


class HeadNet(nn.Module):
    """Class/box head: repeated separable convs with weights SHARED across
    pyramid levels but BatchNorm statistics per level (official EfficientDet
    head structure), then a shared final prediction conv.

    `score_epilogue`, when given, replaces the final prediction conv with
    a fused consumer `epilogue(z, kernel, bias) -> per-level output` (the
    Pallas head-score kernel); the predict_pw parameter tree is unchanged
    (see _ConvParams)."""

    out_channels: int
    repeats: int
    features: int
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False,
                 score_epilogue=None):
        # instantiate shared conv modules once; reusing the same instance
        # across levels ties their parameters in flax
        dw = [
            nn.Conv(self.features, (3, 3), padding="SAME",
                    feature_group_count=self.features, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"dw{r}")
            for r in range(self.repeats)
        ]
        pw = [
            nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"pw{r}")
            for r in range(self.repeats)
        ]
        predict_dw = nn.Conv(
            self.features, (3, 3), padding="SAME",
            feature_group_count=self.features, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="predict_dw",
        )
        if score_epilogue is None:
            predict_pw = nn.Conv(
                self.out_channels, (1, 1), use_bias=True, dtype=jnp.float32,
                param_dtype=self.param_dtype, name="predict_pw",
            )
        else:
            from human_body_proportion_estimation_tpu.models.layers import (
                _ConvParams,
            )

            # parameter-only stand-in with nn.Conv's exact tree
            # ({'kernel' [1,1,in,out], 'bias'}) so checkpoints load
            # identically; the fused Pallas consumer gets raw tensors
            predict_params = _ConvParams(
                (1, 1, self.features, self.out_channels),
                use_bias=True, name="predict_pw",
            )

        outs = []
        for li, x in enumerate(feats):
            if x.shape[-1] != self.features:
                raise ValueError("head input channels must equal fpn channels")
            for r in range(self.repeats):
                x = pw[r](dw[r](x))
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-3, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"bn{r}_l{li}",
                )(x)
                x = relu6(x)
            z = predict_dw(x)
            if score_epilogue is None:
                outs.append(predict_pw(z.astype(jnp.float32)))
            else:
                kernel, bias = predict_params()
                outs.append(score_epilogue(z, kernel, bias))
        return outs


class EfficientDet(nn.Module):
    """[B, H, W, 3] uint8/float image -> per-anchor class logits + box regs.

    Raw head outputs (level-major flattened) are returned; `postprocess`
    turns them into the reference-parity 100-slot detection tensors.
    """

    config: EfficientDetConfig = EFFICIENTDET_LITE4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # fuse the class-head predict conv with the score reduction in a
    # Pallas kernel (TPU serving path; see ops/pallas_kernels.
    # head_score_epilogue). Changes `prescored=True` outputs to
    # (best_logit, PERSON_logit, box_flat) — person-only scoring for the
    # fused person pipeline; the canonical all-class contract stays on
    # score_kernel=False. Parameter tree is identical either way.
    score_kernel: bool = False
    person_class0: int = 0
    # serving Mesh when the program is batch-sharded over 'data': the
    # kernel then runs per-shard via shard_map (pallas_call itself has no
    # SPMD partitioning rule). None = single-device.
    score_kernel_mesh: Any = None
    # pallas interpret mode — CPU-mesh tests of the sharded kernel path
    score_kernel_interpret: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False, prescored: bool = False):
        cfg = self.config
        x = images.astype(jnp.float32)
        # automl lite preprocessing: scale to [-1, 1]
        x = (x - 127.0) / 128.0

        c3, c4, c5 = EfficientNetLite(
            cfg.backbone, dtype=self.dtype, param_dtype=self.param_dtype,
            name="backbone",
        )(x, train)

        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # raw C3/C4/C5 enter the first BiFPN cell directly; that cell's
        # fnodes own the channel resamples (automl topology — see BiFPNLayer)
        p6 = ResampleDown(cfg.fpn_channels, name="p6_down", **dt)(c5, train)
        p7 = ResampleDown(cfg.fpn_channels, name="p7_down", **dt)(p6, train)
        feats = [c3, c4, c5, p6, p7]

        for i in range(cfg.fpn_repeats):
            feats = BiFPNLayer(
                cfg.fpn_channels, name=f"bifpn{i}", **dt
            )(feats, train)

        na = cfg.anchors.anchors_per_cell
        use_kernel = self.score_kernel and prescored and not train
        epilogue = None
        if use_kernel:
            from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
                head_score_epilogue,
            )

            def epilogue(z, kernel, bias):
                return head_score_epilogue(
                    z, kernel, bias, na, cfg.num_classes,
                    person_class0=self.person_class0,
                    mesh=self.score_kernel_mesh,
                    interpret=self.score_kernel_interpret,
                )

        cls_out = HeadNet(
            na * cfg.num_classes, cfg.head_repeats, cfg.fpn_channels,
            name="class_net", **dt,
        )(feats, train, score_epilogue=epilogue)
        box_out = HeadNet(
            na * 4, cfg.head_repeats, cfg.fpn_channels, name="box_net", **dt
        )(feats, train)

        b = images.shape[0]
        box_flat = jnp.concatenate(
            [o.reshape(b, -1, 4) for o in box_out], axis=1
        )
        if use_kernel:
            # cls_out entries are (best_logit, person_logit) per level
            best_logit = jnp.concatenate(
                [o[0].reshape(b, -1) for o in cls_out], axis=1
            )
            person_logit = jnp.concatenate(
                [o[1].reshape(b, -1) for o in cls_out], axis=1
            )
            return best_logit, person_logit, box_flat
        if prescored:
            # reduce over the class axis PER LEVEL, on the head's native
            # [B, H, W, A*C] conv layout, so the max/argmax can fuse with
            # the head epilogue instead of round-tripping the concatenated
            # [B, N, C] tensor through HBM in a lane-misaligned layout.
            # Exact: sigmoid is monotone, so max/argmax over logits ==
            # over sigmoid scores.
            na = cfg.anchors.anchors_per_cell
            logits, classes = [], []
            for o in cls_out:
                lv = o.reshape(
                    b, o.shape[1], o.shape[2], na, cfg.num_classes
                )
                logits.append(jnp.max(lv, axis=-1).reshape(b, -1))
                classes.append(jnp.argmax(lv, axis=-1).reshape(b, -1))
            best_logit = jnp.concatenate(logits, axis=1)     # [B, N]
            best_class = jnp.concatenate(classes, axis=1)    # [B, N]
            return best_logit, best_class, box_flat
        cls_flat = jnp.concatenate(
            [o.reshape(b, -1, cfg.num_classes) for o in cls_out], axis=1
        )
        return cls_flat, box_flat


def postprocess(
    cls_logits: jax.Array,
    box_regs: jax.Array,
    image_hw: tuple[int, int],
    config: EfficientDetConfig = EFFICIENTDET_LITE4,
    score_threshold: float = 0.0,
    iou_threshold: float = 0.5,
    top_k: int = 512,
):
    """Raw head outputs -> reference-parity detection tensors for one image.

    Returns (boxes [100,4] pixel yxyx, scores [100], classes [100] 1-based,
    valid [100]) — mirroring the served SavedModel outputs consumed at
    `models/conv.py:16-18`. Fixed-shape: score-topk + masked NMS.
    """
    # sigmoid is monotone, so reduce over LOGITS and activate only the
    # winner — identical to sigmoid-then-max (the model's `prescored` mode
    # performs the same reduction per level, fused with the head epilogue)
    best_logit = jnp.max(cls_logits, axis=-1)
    best_class = jnp.argmax(cls_logits, axis=-1)
    return postprocess_prescored(
        best_logit, best_class, box_regs, image_hw, config,
        score_threshold=score_threshold, iou_threshold=iou_threshold,
        top_k=top_k,
    )


def person_slots(
    best_logit: jax.Array,      # [N] per-anchor winning-class logit
    person_logit: jax.Array,    # [N] per-anchor person-class logit
    box_regs: jax.Array,        # [N, 4]
    image_hw: tuple[int, int],
    config: EfficientDetConfig,
    det_threshold: jax.Array,
    iou_threshold: float = 0.5,
    top_k: int = 128,
    max_persons: int = 3,
):
    """Person-only detection slots straight from the score-kernel outputs
    (one image; vmapped by the backend's caller).

    Semantics mirror `postprocess` -> `select_persons` for the person
    class: an anchor is a person candidate iff person is its argmax class
    — `person_logit >= best_logit` with person index 0 reproduces argmax's
    first-wins tie rule exactly — and per-class NMS means person-box
    survival depends only on person boxes, so NMS over person candidates
    alone is exact. Difference (strictly better, TPU fused path only): the
    candidate cut is the person-score top-K rather than the all-class
    global top-K, so crowded scenes can't push persons out of the
    candidate set. Returns (boxes [P, 4] pixel yxyx, scores [P],
    valid [P]).
    """
    from human_body_proportion_estimation_tpu.ops import nms as nms_ops

    is_person = person_logit >= best_logit
    scores = jnp.where(is_person, jax.nn.sigmoid(person_logit), 0.0)
    top_scores, idx = jax.lax.top_k(scores, top_k)

    anchors = jnp.asarray(generate_anchors(config.anchors, *image_hw))
    boxes_yxyx = decode_boxes(box_regs[idx], anchors[idx])
    h, w = image_hw
    boxes_yxyx = jnp.clip(
        boxes_yxyx, 0.0, jnp.asarray([h, w, h, w], jnp.float32)
    )
    boxes_xyxy = boxes_yxyx[:, jnp.array([1, 0, 3, 2])]
    keep = nms_ops.nms_mask(boxes_xyxy, top_scores, iou_threshold)

    final = jnp.where(
        keep & (top_scores >= det_threshold) & (top_scores > 0.0),
        top_scores, 0.0,
    )
    sel_scores, sel = jax.lax.top_k(final, max_persons)
    return boxes_yxyx[sel], sel_scores, sel_scores > 0.0


def postprocess_prescored(
    best_logit: jax.Array,      # [N] winning-class logit per anchor
    best_class: jax.Array,      # [N] winning class (0-based int)
    box_regs: jax.Array,        # [N, 4]
    image_hw: tuple[int, int],
    config: EfficientDetConfig = EFFICIENTDET_LITE4,
    score_threshold: float = 0.0,
    iou_threshold: float = 0.5,
    top_k: int = 512,
):
    """`postprocess` for pre-reduced class scores (see EfficientDet's
    `prescored` mode). Same reference-parity outputs."""
    anchors = jnp.asarray(generate_anchors(config.anchors, *image_hw))
    best_score = jax.nn.sigmoid(best_logit)

    boxes_yxyx = decode_boxes(box_regs, anchors)
    h, w = image_hw
    boxes_yxyx = jnp.stack(
        [
            jnp.clip(boxes_yxyx[:, 0], 0, h),
            jnp.clip(boxes_yxyx[:, 1], 0, w),
            jnp.clip(boxes_yxyx[:, 2], 0, h),
            jnp.clip(boxes_yxyx[:, 3], 0, w),
        ],
        axis=-1,
    )
    # nms ops expect xyxy; swap, run class-wise NMS, swap back
    boxes_xyxy = boxes_yxyx[:, jnp.array([1, 0, 3, 2])]
    masked_scores = jnp.where(best_score > score_threshold, best_score, 0.0)
    res = nms_ops.nms_fixed(
        boxes_xyxy,
        masked_scores,
        iou_threshold=iou_threshold,
        max_det=config.max_detections,
        top_k=top_k,
        classes=best_class.astype(jnp.float32),
        class_agnostic=False,
    )
    out_yxyx = res.boxes[:, jnp.array([1, 0, 3, 2])]
    classes_1based = jnp.where(res.valid, res.classes + 1.0, 0.0)
    return out_yxyx, res.scores, classes_1based, res.valid
