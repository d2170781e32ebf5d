"""YOLOv5: head shapes, decode parity vs a numpy port of the reference
anchor-grid math, and end-to-end NMS plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.models import yolov5 as Y
from human_body_proportion_estimation_tpu.ops.nms import yolo_nms


@pytest.fixture(scope="module")
def s_heads():
    model = Y.YoloV5(config=Y.YOLOV5S, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model.apply(params, x)


def test_head_shapes(s_heads):
    h3, h4, h5 = s_heads
    assert h3.shape == (1, 8, 8, 255)
    assert h4.shape == (1, 4, 4, 255)
    assert h5.shape == (1, 2, 2, 255)


def test_total_predictions_640():
    # 640 input must give the reference's canonical 25200 rows
    n = sum((640 // s) ** 2 * 3 for s in Y.STRIDES)
    assert n == 25200


def numpy_reference_decode(head, stride, anchors, nc=80):
    """Port of the raw-output decode loop (obj_det_yolov5_onnx.py:144-166)."""
    b, h, w, _ = head.shape
    y = head.reshape(b, h, w, 3, 5 + nc)
    sig = 1 / (1 + np.exp(-y))
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    cx = (sig[..., 0] * 2.0 - 0.5 + gx[None, :, :, None]) * stride
    cy = (sig[..., 1] * 2.0 - 0.5 + gy[None, :, :, None]) * stride
    anc = np.asarray(anchors, np.float32)
    wh = (sig[..., 2:4] * 2) ** 2 * anc[None, None, None]
    out = np.concatenate(
        [cx[..., None], cy[..., None], wh, sig[..., 4:]], -1
    )
    return out.reshape(b, -1, 5 + nc)


def test_decode_matches_reference_math(rng, s_heads):
    heads = [np.asarray(h) for h in s_heads]
    # use random logits for a stronger check than the zero-init outputs
    heads = [rng.normal(0, 1, h.shape).astype(np.float32) for h in heads]
    got = np.asarray(Y.decode_predictions([jnp.asarray(h) for h in heads]))
    expect = np.concatenate(
        [
            numpy_reference_decode(h, s, a)
            for h, s, a in zip(heads, Y.STRIDES, Y.ANCHORS)
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_decode_to_nms_pipeline(rng, s_heads):
    heads = [
        jnp.asarray(rng.normal(0, 1, np.asarray(h).shape).astype(np.float32))
        for h in s_heads
    ]
    pred = Y.decode_predictions(heads)[0]
    res = yolo_nms(pred, conf_thres=0.4, iou_thres=0.5, top_k=256)
    assert res.boxes.shape == (300, 4)
    assert np.all(np.isfinite(np.asarray(res.boxes)))


def test_m_width_depth():
    cfg = Y.YOLOV5M
    assert cfg.width(64) == 48 and cfg.width(1024) == 768
    assert cfg.depth(3) == 2 and cfg.depth(9) == 6


def test_decode_scored_matches_classic_path(rng):
    """The pre-sigmoid class reduction (decode_scored + yolo_nms_scored)
    must reproduce the classic decode_predictions + yolo_nms results
    bit-for-bit: sigmoid is strictly monotonic, so argmax/max over class
    channels commute with it, and the winning confidence is computed from
    the same two floats either way."""
    from human_body_proportion_estimation_tpu.ops.nms import (
        yolo_nms_scored,
    )

    # synthetic heads with realistic logit range (no sigmoid saturation
    # ties, which are the one documented argmax edge case)
    heads = []
    for (h, w) in ((8, 8), (4, 4), (2, 2)):
        heads.append(jnp.asarray(
            rng.normal(0, 3, (2, h, w, 255)).clip(-8, 8), jnp.float32
        ))

    preds = Y.decode_predictions(heads)
    bxywh, obj, best_cls, best_logit = Y.decode_scored(heads)

    for img in range(2):
        for cf in (None, 0):
            a = yolo_nms(preds[img], conf_thres=0.1, iou_thres=0.5,
                         max_det=16, top_k=64, class_filter=cf)
            b = yolo_nms_scored(
                bxywh[img], obj[img], best_cls[img], best_logit[img],
                conf_thres=0.1, iou_thres=0.5, max_det=16, top_k=64,
                class_filter=cf,
            )
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid))
            np.testing.assert_array_equal(np.asarray(a.boxes),
                                          np.asarray(b.boxes))
            np.testing.assert_array_equal(np.asarray(a.scores),
                                          np.asarray(b.scores))
            np.testing.assert_array_equal(np.asarray(a.classes),
                                          np.asarray(b.classes))


def test_pipeline_legacy_nms_dispatch(rng, s_heads):
    """YoloDetectPipeline(legacy_nms=True) must route through
    yolo_nms_legacy (the reference w_non_max_suppression port) with the
    configured class-column count — identical to calling it directly."""
    from human_body_proportion_estimation_tpu.ops.nms import yolo_nms_legacy
    from human_body_proportion_estimation_tpu.pipeline.detect import (
        YoloDetectPipeline,
    )

    model = Y.YoloV5(config=Y.YOLOV5S, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)

    pipe = YoloDetectPipeline(
        model, conf_thres=0.3, iou_thres=0.4, max_det=16, top_k=64,
        legacy_nms=True, num_classes=80,
    )
    got = pipe.forward(params, x)

    heads = model.apply(params, x)
    pred = Y.decode_predictions(heads)[0]
    want = yolo_nms_legacy(pred, 80, 0.3, 0.4, max_det=16, top_k=64)
    np.testing.assert_array_equal(np.asarray(got.valid[0]),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.boxes[0]),
                                  np.asarray(want.boxes))
