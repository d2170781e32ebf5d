"""Fused pipeline: person selection semantics + end-to-end shape/finiteness
with small random-init models (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.pipeline.full import select_persons
from human_body_proportion_estimation_tpu.pipeline.host import (
    format_image_result,
)


def test_select_persons_filters_class_threshold_topk():
    boxes = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    scores = jnp.asarray([0.9, 0.85, 0.8, 0.75, 0.6, 0.5])
    classes = jnp.asarray([1.0, 2.0, 1.0, 1.0, 1.0, 1.0])
    valid = jnp.asarray([True, True, True, True, True, False])
    b, s, v = select_persons(
        boxes, scores, classes, valid, jnp.float32(0.7),
        person_class_id=1, max_persons=3,
    )
    # class-2 and below-threshold and invalid rows excluded; top-3 persons
    # by score = rows 0, 2, 3
    assert np.all(np.asarray(v))
    np.testing.assert_allclose(np.asarray(s), [0.9, 0.8, 0.75])
    np.testing.assert_allclose(np.asarray(b), np.asarray(boxes)[[0, 2, 3]])


def test_select_persons_none_found():
    boxes = jnp.zeros((4, 4))
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([2.0, 3.0, 2.0, 44.0])
    valid = jnp.ones(4, bool)
    _, s, v = select_persons(
        boxes, scores, classes, valid, jnp.float32(0.5), 1, 3
    )
    assert not np.any(np.asarray(v))
    np.testing.assert_allclose(np.asarray(s), 0.0)


@pytest.fixture(scope="module")
def tiny_pipeline():
    # canonical tiny shapes + depth-reduced models (tests/tiny_models.py)
    from tests.tiny_models import make_tiny_pipeline

    return make_tiny_pipeline()


def test_end_to_end_shapes_and_finiteness(tiny_pipeline, rng):
    imgs = [
        rng.integers(0, 256, (240, 320, 3), dtype=np.uint8),
        rng.integers(0, 256, (480, 480, 3), dtype=np.uint8),
    ]
    out = tiny_pipeline.infer_images(imgs, 175.0, det_threshold=0.0)
    assert out.boxes_norm.shape == (2, 3, 4)
    assert out.keypoints.shape == (2, 3, 17, 2)
    assert out.lengths_cm.shape == (2, 3, 11)
    for arr in [out.boxes_norm, out.keypoints, out.lengths_cm]:
        assert np.all(np.isfinite(np.asarray(arr)))
    # random weights + threshold 0: some persons may be "found"; the
    # lengths of invisible segments must be exactly 0
    lv = np.asarray(out.lengths_cm)[~np.asarray(out.seg_visible)]
    np.testing.assert_array_equal(lv, 0.0)


def test_high_threshold_yields_no_humans(tiny_pipeline, rng):
    img = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    out = tiny_pipeline.infer_images([img], 175.0, det_threshold=1.1)
    assert not np.any(np.asarray(out.person_valid))
    res = format_image_result(out, 0)
    assert len(res) == 2  # boxes + heatmaps only, no dist dicts


def test_infer_bytes_contract(tiny_pipeline, rng):
    import cv2

    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    resp = tiny_pipeline.infer_bytes(enc.tobytes(), 175, det_threshold=1.1)
    assert resp["code"] == "success"
    assert resp["msg"] == "No humans detected"
    assert resp["body_proportion_lengths_(cm)"] == {}


def test_infer_bytes_garbage_fails_cleanly(tiny_pipeline):
    resp = tiny_pipeline.infer_bytes(b"not an image at all")
    assert resp["code"] == "failed"
