"""Full fused pipeline with the REAL-weight SSD detector backend: genuine
person detection end-to-end on the reference fixture (pose weights are
random, so only detection-side outputs are asserted)."""

import os

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.models.tflite_import import (
    DEFAULT_TFLITE_PATH,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEFAULT_TFLITE_PATH),
    reason="reference ssd.tflite not available",
)

FIXTURE = "/root/reference/media/imgs/two people.jpg"


@pytest.fixture(scope="module")
def ssd_pipeline():
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(name="ssd_mobilenet"),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    from tests.tiny_models import tiny_hrnet

    # real-weight SSD detector + depth-reduced pose (random weights
    # either way; the property under test is pipeline math, not depth)
    return InferencePipeline(config=cfg, pose=tiny_hrnet())


def test_ssd_weights_flagged_real(ssd_pipeline):
    # guardrail bookkeeping: the tflite-imported detector is real, the
    # random-init pose slot is not
    assert ssd_pipeline.weights_origin["detector"] == "real"
    assert ssd_pipeline.weights_origin["pose"] == "random"


def test_two_people_detected_end_to_end(ssd_pipeline):
    import cv2

    img = cv2.imread(FIXTURE)[..., ::-1]
    out = ssd_pipeline.infer_images([img], 175.0, det_threshold=0.5)
    valid = np.asarray(out.person_valid[0])
    assert int(valid.sum()) == 2

    # boxes in original-image pixel space, plausible person geometry
    boxes = np.asarray(out.boxes_orig[0])[valid]
    oh, ow = img.shape[:2]
    assert np.all(boxes[:, 0] < boxes[:, 2]) and np.all(boxes[:, 1] < boxes[:, 3])
    assert np.all(boxes[:, 2] <= oh + 1) and np.all(boxes[:, 3] <= ow + 1)
    heights_px = boxes[:, 2] - boxes[:, 0]
    assert np.all(heights_px > 0.5 * oh)  # standing people fill the frame

    # the two detections are distinct persons (non-identical boxes)
    assert np.abs(boxes[0] - boxes[1]).max() > 20


def test_threshold_filters_ssd_detections(ssd_pipeline):
    import cv2

    img = cv2.imread(FIXTURE)[..., ::-1]
    out = ssd_pipeline.infer_images([img], 175.0, det_threshold=0.99)
    assert int(np.asarray(out.person_valid).sum()) == 0
