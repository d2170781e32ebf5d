"""YOLOv5 as a fused-pipeline serving backend (VERDICT missing #4).

The reference hosts yolov5m behind the same Triton gRPC server as a
detection-only demo (`obj_det_yolov5_trtserver.py:53`); here the YOLO slot
feeds the full det->crop->pose->proportions program like any other backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.pipeline.backends import YoloBackend
from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)


@pytest.fixture(scope="module")
def yolo_pipeline():
    cfg = PipelineConfig(
        detector=DetectorConfig(name="yolov5s", input_height=128,
                                input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    backend = YoloBackend(cfg, variant="yolov5s", input_size=128)
    from tests.tiny_models import tiny_hrnet

    return InferencePipeline(config=cfg, backend=backend,
                             pose=tiny_hrnet())


def test_yolo_end_to_end_shapes_and_finiteness(yolo_pipeline, rng):
    imgs = [
        rng.integers(0, 256, (240, 320, 3), dtype=np.uint8),
        rng.integers(0, 256, (480, 480, 3), dtype=np.uint8),
    ]
    out = yolo_pipeline.infer_images(imgs, 175.0, det_threshold=0.0)
    assert out.boxes_norm.shape == (2, 3, 4)
    assert out.keypoints.shape == (2, 3, 17, 2)
    assert out.lengths_cm.shape == (2, 3, 11)
    for arr in [out.boxes_norm, out.keypoints, out.lengths_cm]:
        assert np.all(np.isfinite(np.asarray(arr)))
    lv = np.asarray(out.lengths_cm)[~np.asarray(out.seg_visible)]
    np.testing.assert_array_equal(lv, 0.0)


def test_yolo_high_threshold_no_humans(yolo_pipeline, rng):
    img = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    out = yolo_pipeline.infer_images([img], 175.0, det_threshold=1.1)
    assert not np.any(np.asarray(out.person_valid))


def test_yolo_serving_packed_contract(yolo_pipeline, rng):
    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    packed = yolo_pipeline.infer_serving([img], 175.0, det_threshold=1.1)
    assert packed.shape == (1, 3, 23)
    np.testing.assert_array_equal(packed[:, :, 0], 0.0)  # no valid persons


def test_yolo_backend_unletterbox_geometry(rng):
    """A synthetic person-class box placed in letterbox space must come back
    in det-input pixel space (scale_coords parity, onnx_utils.py:252-266)."""
    from human_body_proportion_estimation_tpu.ops import boxes as box_ops

    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=96, input_width=128)
    )
    # letterbox 128x128 of a 96x128 image: gain 1.0, pad_y 16
    xyxy_lb = jnp.asarray([[10.0, 30.0, 50.0, 80.0]])
    out = box_ops.scale_coords_letterbox(xyxy_lb, (128, 128), (96, 128))
    np.testing.assert_allclose(
        np.asarray(out), [[10.0, 14.0, 50.0, 64.0]], atol=1e-5
    )


def test_yolo_backend_weights_flagged_random():
    cfg = PipelineConfig(
        detector=DetectorConfig(name="yolov5s", input_height=64,
                                input_width=64),
        pose=PoseConfig(crop_height=32, crop_width=32,
                        heatmap_height=8, heatmap_width=8),
    )
    backend = YoloBackend(cfg, variant="yolov5s", input_size=64)
    from tests.tiny_models import tiny_hrnet

    pipe = InferencePipeline(config=cfg, backend=backend,
                             pose=tiny_hrnet())
    assert pipe.weights_origin == {"detector": "random", "pose": "random"}
