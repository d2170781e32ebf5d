"""Edge-alternative person detector: SSD-MobileNetV1 with real weights.

Parity target: `modules/human_detector.py` (`HumanDetectorTflite`) — the
reference's CPU/edge detector slot. Same behavior: 300x300 uint8 input,
person = class 0 of the background-stripped outputs, score-threshold
filter (:31-38), and the normalized y1x1y2x2 crop helper (:41-64). The
difference: instead of dispatching to the TFLite C++ runtime, the network
runs as a jit program (TPU or CPU) with weights dequantized from the very
same checked-in blob by `models/tflite_import.py`.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
    SSDMobileNetV1,
    ssd_postprocess,
)
from human_body_proportion_estimation_tpu.models.tflite_import import (
    DEFAULT_TFLITE_PATH,
    load_ssd_weights,
)

PERSON_CLASS = 0  # background-stripped tflite class ids (reference :31-38)


class HumanDetectorSSD:
    """Drop-in analog of the reference's HumanDetectorTflite."""

    def __init__(
        self,
        tflite_path: str = DEFAULT_TFLITE_PATH,
        threshold: float = 0.3,
        dtype=jnp.float32,
    ):
        self.threshold = threshold
        variables, anchors = load_ssd_weights(tflite_path)
        self.model = SSDMobileNetV1(dtype=dtype)
        device = jax.devices()[0]
        self.variables = jax.device_put(
            jax.tree.map(jnp.asarray, variables), device
        )
        self.anchors = jax.device_put(jnp.asarray(anchors), device)

        def program(variables, anchors, images):
            box_regs, logits = self.model.apply(variables, images)

            def one(br, lg):
                return ssd_postprocess(br, lg, anchors)

            return jax.vmap(one)(box_regs, logits)

        self._program = jax.jit(program)

    def get_detections(
        self, image_rgb: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Person boxes (normalized y1x1y2x2) + scores above threshold."""
        import cv2

        inp = cv2.resize(image_rgb, (300, 300)).astype(np.uint8)
        det = self._program(self.variables, self.anchors,
                            jnp.asarray(inp[None]))
        boxes = np.asarray(det.boxes[0])
        classes = np.asarray(det.classes[0])
        scores = np.asarray(det.scores[0])
        valid = np.asarray(det.valid[0])
        keep = valid & (classes == PERSON_CLASS) & (scores >= self.threshold)
        return boxes[keep], scores[keep]

    def get_crops(self, image_rgb: np.ndarray) -> List[np.ndarray]:
        """Cropped person regions from normalized boxes (reference :41-64)."""
        boxes, _ = self.get_detections(image_rgb)
        h, w = image_rgb.shape[:2]
        crops = []
        for y1, x1, y2, x2 in boxes:
            ya, xa = max(int(y1 * h), 0), max(int(x1 * w), 0)
            yb, xb = min(int(y2 * h), h), min(int(x2 * w), w)
            if yb > ya and xb > xa:
                crops.append(image_rgb[ya:yb, xa:xb])
        return crops
