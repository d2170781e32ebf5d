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
    postprocess as edet_postprocess,
)
from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
    SSDMobileNetV1,
    ssd_postprocess,
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
        cls_logits, box_regs = self.detector.apply(det_vars, image_f32[None])
        boxes, scores, classes, valid = edet_postprocess(
            cls_logits[0],
            box_regs[0],
            (cfg.detector.input_height, cfg.detector.input_width),
            self.detector.config,
            iou_threshold=cfg.detector.iou_threshold,
            top_k=cfg.detector.nms_top_k,
        )
        return select_persons(
            boxes, scores, classes, valid, det_threshold,
            cfg.detector.person_class_id, cfg.detector.max_persons,
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
