"""Detection-only jit pipelines (EfficientDet and YOLOv5 paths).

Mirrors the reference's standalone detector demos:
  * EfficientDet path (`obj_det_edet4_trtserver.py`): uint8 image at the
    model size -> 100 detection slots (pixel y1x1y2x2 + scores + 1-based
    classes), i.e. the "modified" SavedModel output schema (:22-37).
  * YOLOv5 path (`obj_det_yolov5_trtserver.py` / `obj_det_yolov5_onnx.py`):
    letterboxed 640x640 float input -> anchor-decoded predictions ->
    class-offset NMS -> boxes scaled back to the original image
    (xyxy + conf + class, reference onnx_utils.py NMS + scale_coords).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models.efficientdet import (
    EfficientDet,
    postprocess as edet_postprocess,
)
from human_body_proportion_estimation_tpu.models.yolov5 import (
    YoloV5,
    decode_predictions,
)
from human_body_proportion_estimation_tpu.ops import boxes as box_ops
from human_body_proportion_estimation_tpu.ops.nms import (
    NmsResult,
    yolo_nms,
    yolo_nms_legacy,
)


class Detections(NamedTuple):
    boxes: jax.Array    # [B, N, 4]
    scores: jax.Array   # [B, N]
    classes: jax.Array  # [B, N]
    valid: jax.Array    # [B, N] bool


class EdetDetectPipeline:
    """jit program: uint8 [B, H, W, 3] -> 100 yxyx pixel detections."""

    def __init__(self, detector: EfficientDet, input_hw: Tuple[int, int],
                 iou_threshold: float = 0.5, top_k: int = 128):
        self.detector = detector
        self.input_hw = input_hw
        self.iou_threshold = iou_threshold
        self.top_k = top_k

    def forward(self, det_vars: Any, images: jax.Array) -> Detections:
        cls_logits, box_regs = self.detector.apply(
            det_vars, images.astype(jnp.float32)
        )

        def one(c, b):
            return edet_postprocess(
                c, b, self.input_hw, self.detector.config,
                iou_threshold=self.iou_threshold, top_k=self.top_k,
            )

        boxes, scores, classes, valid = jax.vmap(one)(cls_logits, box_regs)
        return Detections(boxes, scores, classes, valid)

    def jit(self):
        return jax.jit(self.forward)


class YoloDetectPipeline:
    """jit program: letterboxed f32 [B, S, S, 3] in [0,1] -> NMS'd xyxy."""

    def __init__(self, model: YoloV5, conf_thres: float = 0.4,
                 iou_thres: float = 0.5, max_det: int = 300,
                 top_k: int = 512, class_filter: int | None = None,
                 legacy_nms: bool = False, num_classes: int | None = None):
        self.model = model
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.top_k = top_k
        self.class_filter = class_filter
        # legacy mode = the reference's second postprocess
        # (`w_non_max_suppression`, modules/onnx_utils.py:39-95): obj-conf
        # gating + per-class +1-IoU NMS over `num_classes` class columns
        # (the `-c/--num_classes` CLI knob, modules/utils.py:100-102)
        self.legacy_nms = legacy_nms
        self.num_classes = num_classes or model.config.num_classes

    def forward(self, variables: Any, images: jax.Array) -> Detections:
        heads = self.model.apply(variables, images)
        preds = decode_predictions(heads, self.model.config.num_classes)

        def one(p) -> NmsResult:
            if self.legacy_nms:
                return yolo_nms_legacy(
                    p, self.num_classes, self.conf_thres, self.iou_thres,
                    self.max_det, self.top_k,
                )
            return yolo_nms(
                p, self.conf_thres, self.iou_thres, self.max_det,
                self.top_k, class_filter=self.class_filter,
            )

        res = jax.vmap(one)(preds)
        return Detections(res.boxes, res.scores, res.classes, res.valid)

    def jit(self):
        return jax.jit(self.forward)


def letterbox_host(img_rgb: np.ndarray, size: int = 640) -> np.ndarray:
    """Host PIL letterbox to size x size, /255 float32 (the reference YOLO
    preprocess, `obj_det_yolov5_onnx.py:27-36` incl. bicubic + gray pad)."""
    from PIL import Image

    pil = Image.fromarray(img_rgb)
    iw, ih = pil.size
    scale = min(size / iw, size / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = pil.resize((nw, nh), Image.BICUBIC)
    canvas = Image.new("RGB", (size, size), (128, 128, 128))
    canvas.paste(resized, ((size - nw) // 2, (size - nh) // 2))
    return np.asarray(canvas, np.float32) / 255.0


def scale_boxes_to_original(
    boxes_xyxy: np.ndarray, model_size: int, orig_hw: Tuple[int, int]
) -> np.ndarray:
    """Undo the letterbox on detection boxes (reference scale_coords)."""
    out = box_ops.scale_coords_letterbox(
        jnp.asarray(boxes_xyxy), (model_size, model_size), orig_hw
    )
    return np.asarray(out)
