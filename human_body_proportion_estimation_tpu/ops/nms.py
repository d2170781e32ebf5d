"""Fixed-shape, mask-based non-maximum suppression for XLA.

The reference runs NMS on the host in torch/torchvision with data-dependent
shapes and a Python while-loop (`modules/onnx_utils.py:39-95,125-222`). That
shape-dynamism is hostile to XLA, so this module restates greedy NMS as a
static-shape program:

  1. top-K candidates by score (K static),
  2. one K x K IoU matrix (rides the VPU),
  3. a `lax.fori_loop` over rows carrying a keep mask — box i survives iff no
     higher-scoring surviving box overlaps it above the IoU threshold.

Greedy-equivalence: processing in descending score order makes the row sweep
identical to the sequential pick-max/suppress loop of torchvision.ops.nms.
Outputs are padded to `max_det` slots with a validity mask instead of being
truncated to a dynamic length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops.boxes import box_iou, xywh2xyxy

# class-offset trick constant: boxes of different classes are shifted to
# disjoint coordinate ranges so one class-agnostic NMS handles all classes
# (reference `modules/onnx_utils.py:141,202-204`).
MAX_WH = 4096.0


class NmsResult(NamedTuple):
    boxes: jax.Array    # [max_det, 4] xyxy
    scores: jax.Array   # [max_det]
    classes: jax.Array  # [max_det]
    valid: jax.Array    # [max_det] bool


def box_iou_plus1(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU with the legacy +1 pixel convention of the reference's
    second NMS variant (`w_bbox_iou`, modules/onnx_utils.py:8-36): widths/
    heights counted as x2-x1+1."""
    wa = jnp.maximum(a[:, 2] - a[:, 0] + 1.0, 0.0)
    ha = jnp.maximum(a[:, 3] - a[:, 1] + 1.0, 0.0)
    wb = jnp.maximum(b[:, 2] - b[:, 0] + 1.0, 0.0)
    hb = jnp.maximum(b[:, 3] - b[:, 1] + 1.0, 0.0)
    area_a = wa * ha
    area_b = wb * hb
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt + 1.0, 0.0), axis=-1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-16)


def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    legacy_plus1_iou: bool = False,
) -> jax.Array:
    """Greedy NMS keep-mask over [K,4] xyxy boxes sorted by descending score.

    Scores only gate validity (score<=0 rows are dead padding); ordering must
    already be descending. Returns a bool [K] keep mask.
    """
    k = boxes.shape[0]
    iou_fn = box_iou_plus1 if legacy_plus1_iou else box_iou
    overlapping = iou_fn(boxes, boxes) > iou_threshold

    def body(i, keep):
        # Box i is suppressed iff any kept earlier (higher-score) box
        # overlaps it. `arange < i` restricts to earlier rows statically.
        earlier = jnp.arange(k) < i
        suppressed = jnp.any(earlier & keep & overlapping[:, i])
        return keep.at[i].set(keep[i] & ~suppressed)

    keep0 = scores > 0.0
    return jax.lax.fori_loop(0, k, body, keep0)


def nms_fixed(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    top_k: int = 512,
    classes: jax.Array | None = None,
    class_agnostic: bool = True,
) -> NmsResult:
    """Greedy NMS with static shapes.

    Args:
        boxes: [N, 4] xyxy.
        scores: [N]; entries <= 0 are treated as invalid (pre-masked).
        iou_threshold: suppression IoU.
        max_det: output slots (reference cap 300, onnx_utils.py:142).
        top_k: candidates entering the K x K IoU stage (reference feeds up to
            30000 into torchvision, onnx_utils.py:143; 512 is ample for the
            <=3-person serving path and configurable for parity tests).
        classes: optional [N] class ids carried through to the output.
        class_agnostic: if False, suppression is done per class via the
            class-offset trick (boxes shifted by class_id * MAX_WH).

    Returns fixed-shape NmsResult; invalid slots are zeroed.
    """
    n = boxes.shape[0]
    if classes is None:
        classes = jnp.zeros((n,), boxes.dtype)
    k = min(top_k, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]

    nms_boxes = top_boxes
    if not class_agnostic:
        nms_boxes = top_boxes + top_classes.astype(boxes.dtype)[:, None] * MAX_WH
    keep = nms_mask(nms_boxes, top_scores, iou_threshold)

    # Compact kept rows to the front, preserving descending score order:
    # sort by (kept first, original rank) via a single key.
    rank = jnp.arange(k)
    perm = jnp.argsort(jnp.where(keep, rank, rank + k))[:max_det]
    out_valid = keep[perm]
    pad = max(0, max_det - k)
    if pad:
        perm = jnp.pad(perm, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad), constant_values=False)

    out_boxes = jnp.where(out_valid[:, None], top_boxes[perm], 0.0)
    out_scores = jnp.where(out_valid, top_scores[perm], 0.0)
    out_classes = jnp.where(out_valid, top_classes[perm], 0.0)
    return NmsResult(out_boxes, out_scores, out_classes, out_valid)


def yolo_nms(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    top_k: int = 512,
    agnostic: bool = False,
    class_filter: int | None = None,
) -> NmsResult:
    """YOLOv5 "official" postprocess for one image, fixed-shape.

    Semantics of reference `non_max_suppression`
    (`modules/onnx_utils.py:125-222`), best-class-only branch:
      conf = obj_conf * cls_conf; keep obj > thres and conf > thres;
      xywh -> xyxy; class-offset batched NMS; cap at max_det.

    Args:
        prediction: [N, 5+nc] rows (cx, cy, w, h, obj, cls...).
        class_filter: optional single class id to keep (the pipeline's
            person-only filter, reference FLAGS.classes=0).
    """
    boxes = xywh2xyxy(prediction[:, :4])
    obj = prediction[:, 4]
    cls_conf = prediction[:, 5:] * obj[:, None]
    best_cls = jnp.argmax(cls_conf, axis=-1)
    conf = jnp.max(cls_conf, axis=-1)

    valid = (obj > conf_thres) & (conf > conf_thres)
    if class_filter is not None:
        valid &= best_cls == class_filter
    conf = jnp.where(valid, conf, 0.0)

    return nms_fixed(
        boxes,
        conf,
        iou_thres,
        max_det,
        top_k,
        classes=best_cls.astype(boxes.dtype),
        class_agnostic=agnostic,
    )


def yolo_nms_scored(
    boxes_xywh: jax.Array,
    obj: jax.Array,
    best_cls: jax.Array,
    best_logit: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    top_k: int = 512,
    agnostic: bool = False,
    class_filter: int | None = None,
) -> NmsResult:
    """`yolo_nms` from the pre-reduced representation produced by
    `models.yolov5.decode_scored` (class argmax/max already taken on
    logits — sigmoid-monotonicity makes the selection identical, see
    there). Same reference semantics (`modules/onnx_utils.py:125-222`,
    best-class branch): conf = sigmoid(best_logit) * obj; keep
    obj > thres and conf > thres; xywh -> xyxy; class-offset batched
    NMS; cap at max_det.

    Args:
        boxes_xywh: [N, 4] (cx, cy, w, h) decoded boxes.
        obj: [N] objectness probability (post-sigmoid).
        best_cls: [N] int best class index.
        best_logit: [N] best class LOGIT (pre-sigmoid).
    """
    boxes = xywh2xyxy(boxes_xywh)
    conf = jax.nn.sigmoid(best_logit) * obj

    valid = (obj > conf_thres) & (conf > conf_thres)
    if class_filter is not None:
        valid &= best_cls == class_filter
    conf = jnp.where(valid, conf, 0.0)

    return nms_fixed(
        boxes,
        conf,
        iou_thres,
        max_det,
        top_k,
        classes=best_cls.astype(boxes.dtype),
        class_agnostic=agnostic,
    )


def yolo_nms_legacy(
    prediction: jax.Array,
    num_classes: int,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
    max_det: int = 300,
    top_k: int = 512,
) -> NmsResult:
    """The reference's second YOLO postprocess (`w_non_max_suppression`,
    modules/onnx_utils.py:39-95): xywh -> xyxy, obj-conf filter, best
    class, per-class greedy NMS with the +1 IoU convention. Expressed
    fixed-shape with the class-offset trick (equivalent to the per-class
    loop because offset boxes of different classes never overlap).
    """
    boxes = xywh2xyxy(prediction[:, :4])
    obj = prediction[:, 4]
    cls_conf = prediction[:, 5:5 + num_classes]
    best_cls = jnp.argmax(cls_conf, axis=-1).astype(boxes.dtype)
    valid = obj >= conf_thres
    scores = jnp.where(valid, obj, 0.0)  # w-NMS sorts by obj conf (:76-78)

    k = min(top_k, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_cls = best_cls[order]
    offset_boxes = top_boxes + top_cls[:, None] * MAX_WH
    keep = nms_mask(offset_boxes, top_scores, nms_thres,
                    legacy_plus1_iou=True)

    rank = jnp.arange(k)
    perm = jnp.argsort(jnp.where(keep, rank, rank + k))[:max_det]
    out_valid = keep[perm]
    pad = max(0, max_det - k)
    if pad:
        perm = jnp.pad(perm, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad), constant_values=False)
    return NmsResult(
        jnp.where(out_valid[:, None], top_boxes[perm], 0.0),
        jnp.where(out_valid, top_scores[perm], 0.0),
        jnp.where(out_valid, top_cls[perm], 0.0),
        out_valid,
    )
