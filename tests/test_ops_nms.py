"""NMS parity: fixed-shape masked NMS vs a greedy numpy oracle."""

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops import nms as N


def greedy_nms_oracle(boxes, scores, iou_thres):
    """Sequential pick-max/suppress NMS (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if scores[i] <= 0 or not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-12)
        alive &= ~(iou > iou_thres)
        alive[i] = False
    return keep


def _rand_dets(rng, n, spread=200.0):
    x1y1 = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_nms_fixed_matches_greedy_oracle(rng):
    for trial in range(5):
        boxes, scores = _rand_dets(rng, 100)
        expect = greedy_nms_oracle(boxes, scores, 0.5)
        res = N.nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores),
            iou_threshold=0.5, max_det=100, top_k=128,
        )
        nvalid = int(np.sum(np.asarray(res.valid)))
        assert nvalid == len(expect)
        np.testing.assert_allclose(
            np.asarray(res.boxes)[:nvalid], boxes[expect], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.scores)[:nvalid], scores[expect], rtol=1e-6
        )


def test_nms_fixed_max_det_cap(rng):
    boxes, scores = _rand_dets(rng, 200, spread=5000.0)  # mostly disjoint
    res = N.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores),
        iou_threshold=0.5, max_det=10, top_k=256,
    )
    assert res.boxes.shape == (10, 4)
    expect = greedy_nms_oracle(boxes, scores, 0.5)[:10]
    nvalid = int(np.sum(np.asarray(res.valid)))
    np.testing.assert_allclose(
        np.asarray(res.boxes)[:nvalid], boxes[expect[:nvalid]], rtol=1e-6
    )


def test_nms_fixed_all_invalid():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    res = N.nms_fixed(boxes, scores, 0.5, max_det=8, top_k=16)
    assert not bool(np.any(np.asarray(res.valid)))


def test_yolo_nms_class_offset_semantics(rng):
    # two boxes at identical coords but different best classes must BOTH
    # survive non-agnostic NMS (reference class-offset trick,
    # onnx_utils.py:202-204); with agnostic=True only one survives.
    n, nc = 8, 3
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, :4] = [50, 50, 20, 20]  # identical cxcywh
    pred[:, 4] = 0.01               # low obj for filler rows
    pred[0, 4], pred[0, 5] = 0.9, 0.99  # class 0
    pred[1, 4], pred[1, 5 + 1] = 0.8, 0.99  # class 1
    res = N.yolo_nms(jnp.asarray(pred), conf_thres=0.4, iou_thres=0.5)
    assert int(np.sum(np.asarray(res.valid))) == 2
    res_ag = N.yolo_nms(
        jnp.asarray(pred), conf_thres=0.4, iou_thres=0.5, agnostic=True
    )
    assert int(np.sum(np.asarray(res_ag.valid))) == 1


def test_yolo_nms_person_filter(rng):
    n, nc = 6, 80
    pred = np.zeros((n, 5 + nc), np.float32)
    for i in range(n):
        pred[i, :4] = [40 + 60 * i, 40, 30, 30]
        pred[i, 4] = 0.9
        pred[i, 5 + (0 if i % 2 == 0 else 7)] = 0.95
    res = N.yolo_nms(
        jnp.asarray(pred), conf_thres=0.4, iou_thres=0.5, class_filter=0
    )
    v = np.asarray(res.valid)
    assert int(v.sum()) == 3
    assert np.all(np.asarray(res.classes)[v] == 0)


def legacy_wnms_oracle(pred, num_classes, conf_thres, nms_thres):
    """Numpy port of the reference w_non_max_suppression semantics
    (per-class greedy NMS, +1 IoU, sorted by obj conf)."""
    boxes = np.stack([
        pred[:, 0] - pred[:, 2] / 2, pred[:, 1] - pred[:, 3] / 2,
        pred[:, 0] + pred[:, 2] / 2, pred[:, 1] + pred[:, 3] / 2,
    ], -1)
    obj = pred[:, 4]
    cls = np.argmax(pred[:, 5:5 + num_classes], -1)
    keep_rows = []
    for c in np.unique(cls[obj >= conf_thres]):
        rows = np.where((cls == c) & (obj >= conf_thres))[0]
        rows = rows[np.argsort(-obj[rows], kind="stable")]
        alive = list(rows)
        while alive:
            best = alive.pop(0)
            keep_rows.append(best)
            survivors = []
            for r in alive:
                b1, b2 = boxes[best], boxes[r]
                iw = max(min(b1[2], b2[2]) - max(b1[0], b2[0]) + 1, 0)
                ih = max(min(b1[3], b2[3]) - max(b1[1], b2[1]) + 1, 0)
                inter = iw * ih
                a1 = (b1[2] - b1[0] + 1) * (b1[3] - b1[1] + 1)
                a2 = (b2[2] - b2[0] + 1) * (b2[3] - b2[1] + 1)
                if inter / (a1 + a2 - inter + 1e-16) < nms_thres:
                    survivors.append(r)
            alive = survivors
    return set(keep_rows)


def test_yolo_nms_legacy_matches_reference_semantics(rng):
    from human_body_proportion_estimation_tpu.ops.nms import yolo_nms_legacy

    n, nc = 60, 4
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0:2] = rng.uniform(50, 250, (n, 2))
    pred[:, 2:4] = rng.uniform(20, 120, (n, 2))
    pred[:, 4] = rng.uniform(0, 1, n)
    pred[np.arange(n), 5 + rng.integers(0, nc, n)] = 1.0

    expect_rows = legacy_wnms_oracle(pred, nc, 0.5, 0.4)
    res = yolo_nms_legacy(jnp.asarray(pred), nc, 0.5, 0.4, top_k=64)
    got_scores = np.asarray(res.scores)[np.asarray(res.valid)]
    expect_scores = np.sort(pred[list(expect_rows), 4])[::-1]
    np.testing.assert_allclose(
        np.sort(got_scores)[::-1], expect_scores, rtol=1e-6
    )
