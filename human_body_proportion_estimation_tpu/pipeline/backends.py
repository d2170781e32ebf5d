"""Detector backends for the fused pipeline.

The reference swaps detectors by re-pointing the Triton model name
(EfficientDet ensemble vs the tflite SSD alternative,
`modules/human_detector.py`). Here a backend is a callable slot inside the
SAME fused jit program: it maps one det-input image to padded person box
slots. All backends emit (boxes_px yxyx in det-input space, scores, valid)
with `max_persons` fixed slots so the downstream crop/pose stages are
backend-agnostic.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.efficientdet import (
    EfficientDet,
    person_slots as edet_person_slots,
    postprocess_prescored as edet_postprocess_prescored,
)
from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
    SSDMobileNetV1,
    ssd_postprocess,
)
from human_body_proportion_estimation_tpu.ops import (
    boxes as box_ops,
    image as img_ops,
    nms as nms_ops,
)
from human_body_proportion_estimation_tpu.pipeline.full import select_persons
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig


class EfficientDetBackend:
    """EfficientDet-Lite slot (the reference's primary detector)."""

    def __init__(self, detector: EfficientDet, config: PipelineConfig):
        self.detector = detector
        self.config = config

    def init_vars(self, rng) -> Any:
        cfg = self.config
        return self.detector.init(
            rng,
            jnp.zeros(
                (1, cfg.detector.input_height, cfg.detector.input_width, 3),
                jnp.float32,
            ),
        )

    def __call__(self, det_vars, image_f32, det_threshold):
        cfg = self.config
        hw = (cfg.detector.input_height, cfg.detector.input_width)
        if self.detector.score_kernel:
            # TPU serving path: the class-head predict conv + score
            # reduction run as one Pallas kernel (the ~660 MB logits
            # tensor stays in VMEM — ~12 ms saved at b32 on v5e), and the
            # person slots come from a person-only exact NMS
            best_logit, person_logit, box_regs = self.detector.apply(
                det_vars, image_f32[None], prescored=True
            )
            return edet_person_slots(
                best_logit[0], person_logit[0], box_regs[0], hw,
                self.detector.config, det_threshold,
                iou_threshold=cfg.detector.iou_threshold,
                top_k=cfg.detector.nms_top_k,
                max_persons=cfg.detector.max_persons,
            )
        # canonical path (CPU tests / sharded meshes): per-level
        # prescored max/argmax + reference-parity 100-slot postprocess
        best_logit, best_class, box_regs = self.detector.apply(
            det_vars, image_f32[None], prescored=True
        )
        boxes, scores, classes, valid = edet_postprocess_prescored(
            best_logit[0],
            best_class[0],
            box_regs[0],
            hw,
            self.detector.config,
            iou_threshold=cfg.detector.iou_threshold,
            top_k=cfg.detector.nms_top_k,
        )
        return select_persons(
            boxes, scores, classes, valid, det_threshold,
            cfg.detector.person_class_id, cfg.detector.max_persons,
        )


class YoloBackend:
    """YOLOv5 slot inside the fused pipeline.

    The reference can host yolov5m behind the same Triton gRPC server
    (`obj_det_yolov5_trtserver.py:53`) but only as a detection demo; here
    the whole chain — letterbox 640 gray-128 (`:30-37`) -> /255 -> forward
    -> anchor decode -> official NMS conf .4 / IoU .5 (`:40-44`) ->
    scale_coords un-letterbox (`:153-154`) — runs inside the same jit
    program that feeds the pose stage, so YOLO is a first-class serving
    detector, not just a CLI.
    """

    PERSON_CLASS = 0     # 0-based COCO "person" (reference COCO names :17-27)
    CONF_THRES = 0.4     # reference obj_det_yolov5_trtserver.py:40-44
    IOU_THRES = 0.5

    def __init__(self, config: PipelineConfig, variant: str = "yolov5m",
                 input_size: int = 640):
        from human_body_proportion_estimation_tpu.models.yolov5 import (
            YOLOV5L,
            YOLOV5M,
            YOLOV5S,
            YoloV5,
        )

        variants = {
            "yolov5s": YOLOV5S, "yolov5m": YOLOV5M, "yolov5l": YOLOV5L,
        }
        self.model = YoloV5(config=variants[variant])
        self.config = config
        self.input_size = input_size  # 640, reference :30-37

    def init_vars(self, rng) -> Any:
        s = self.input_size
        return self.model.init(rng, jnp.zeros((1, s, s, 3), jnp.float32))

    def __call__(self, det_vars, image_f32, det_threshold):
        from human_body_proportion_estimation_tpu.models.yolov5 import (
            decode_scored,
        )

        cfg = self.config
        s = self.input_size
        boxed = img_ops.letterbox(image_f32, s, s)
        heads = self.model.apply(det_vars, boxed[None] / 255.0)
        # class reduction on logits (sigmoid-monotonic, identical floats
        # downstream) — the [25200, 85] sigmoid tensor never materializes
        bxywh, obj, best_cls, best_logit = decode_scored(
            heads, self.model.config.num_classes
        )
        res = nms_ops.yolo_nms_scored(
            bxywh[0], obj[0], best_cls[0], best_logit[0],
            conf_thres=self.CONF_THRES,
            iou_thres=self.IOU_THRES,
            max_det=cfg.detector.max_detections,
            top_k=cfg.detector.nms_top_k,
            class_filter=self.PERSON_CLASS,
        )
        ih, iw = cfg.detector.input_height, cfg.detector.input_width
        xyxy = box_ops.scale_coords_letterbox(res.boxes, (s, s), (ih, iw))
        yxyx = xyxy[..., jnp.asarray([1, 0, 3, 2])]
        return select_persons(
            yxyx, res.scores, res.classes, res.valid, det_threshold,
            self.PERSON_CLASS, cfg.detector.max_persons,
        )


class SSDBackend:
    """SSD-MobileNetV1 slot with REAL weights from the reference's
    checked-in ssd.tflite (the only offline-pretrained detector)."""

    INPUT_SIZE = 300
    PERSON_CLASS = 0  # background-stripped tflite ids

    def __init__(self, config: PipelineConfig, dtype=jnp.bfloat16):
        self.model = SSDMobileNetV1(dtype=dtype)
        self.config = config

    def init_vars(self, rng) -> Any:
        """Load the real dequantized weights (rng unused); the anchors ride
        inside the variables pytree so they stay a jit argument."""
        from human_body_proportion_estimation_tpu.models.tflite_import import (
            load_ssd_weights,
        )

        variables, anchors = load_ssd_weights()
        return {
            "params": jax.tree.map(jnp.asarray, variables["params"]),
            "anchors": jnp.asarray(anchors),
        }

    def __call__(self, det_vars, image_f32, det_threshold):
        cfg = self.config
        s = self.INPUT_SIZE
        ssd_in = jax.image.resize(
            image_f32, (s, s, 3), method="linear", antialias=False
        )
        box_regs, logits = self.model.apply(
            {"params": det_vars["params"]}, ssd_in[None]
        )
        det = ssd_postprocess(box_regs[0], logits[0], det_vars["anchors"])
        # normalized yxyx -> det-input pixel space
        h = float(cfg.detector.input_height)
        w = float(cfg.detector.input_width)
        boxes_px = det.boxes * jnp.asarray([h, w, h, w], jnp.float32)
        return select_persons(
            boxes_px, det.scores, det.classes, det.valid, det_threshold,
            self.PERSON_CLASS, cfg.detector.max_persons,
        )
