"""Evaluation metrics (metrics/): hand-computed AP oracles, OKS/PCK
semantics, and the evaluate CLI end-to-end on a synthetic COCO dataset."""

import json

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.metrics import (
    average_precision,
    detection_ap,
    match_image,
    oks,
    oks_ap,
    pck,
)


def test_match_image_greedy_claims():
    gts = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    dets = np.asarray([
        [0, 0, 10, 10],     # exact on gt0
        [1, 1, 11, 11],     # overlaps gt0 but it's claimed by higher score
        [20, 20, 30, 30],   # exact on gt1
        [100, 100, 110, 110],  # FP
    ], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.95], np.float32)
    tp = match_image(dets, scores, gts, 0.5)
    assert tp.tolist() == [True, False, True, False]


def test_average_precision_hand_case():
    """3 detections scores .9 TP, .8 FP, .7 TP over 2 gt: precision-recall
    points (1/1, r .5), (1/2, r .5), (2/3, r 1.0) -> envelope gives
    p=1.0 for r<=0.5 and 2/3 above -> 101-pt AP = (51*1 + 50*2/3)/101."""
    ap = average_precision(
        np.asarray([0.9, 0.8, 0.7]), np.asarray([True, False, True]), 2
    )
    expected = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert abs(ap - expected) < 1e-9


def test_average_precision_edges():
    assert average_precision(np.zeros(0), np.zeros(0, bool), 0) != \
        average_precision(np.zeros(0), np.zeros(0, bool), 0)  # nan
    assert average_precision(np.zeros(0), np.zeros(0, bool), 3) == 0.0
    # perfect detector
    assert average_precision(
        np.asarray([0.9, 0.8]), np.asarray([True, True]), 2
    ) == pytest.approx(1.0)


def test_detection_ap_perfect_and_garbage():
    gts = [np.asarray([[0, 0, 10, 10]], np.float32),
           np.asarray([[5, 5, 25, 25], [40, 40, 60, 60]], np.float32)]
    perfect = [(g.copy(), np.full(len(g), 0.9, np.float32)) for g in gts]
    res = detection_ap(perfect, gts)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)

    garbage = [(np.asarray([[900, 900, 910, 910]], np.float32),
                np.asarray([0.9], np.float32)) for _ in gts]
    assert detection_ap(garbage, gts)["mAP"] == pytest.approx(0.0)


def test_oks_perfect_and_falloff():
    kp = np.random.default_rng(0).uniform(0, 100, (17, 2)).astype(np.float32)
    vis = np.ones(17, bool)
    assert oks(kp, kp, vis, area=900.0) == pytest.approx(1.0)
    shifted = kp + np.asarray([200.0, 0.0], np.float32)
    assert oks(shifted, kp, vis, area=900.0) < 0.01
    # larger objects tolerate larger pixel errors
    small_err = kp + 3.0
    assert oks(small_err, kp, vis, area=10000.0) > \
        oks(small_err, kp, vis, area=100.0)


def test_pck_counts_visible_only():
    pred = np.zeros((1, 3, 2), np.float32)
    gt = np.asarray([[[0, 0], [0, 4], [50, 50]]], np.float32)
    vis = np.asarray([[True, True, False]])  # the far point is invisible
    # norm 10, thr .5 -> radius 5: kp0 dist 0 ok, kp1 dist 4 ok
    assert pck(pred, gt, vis, 10.0, threshold=0.5) == pytest.approx(1.0)
    vis2 = np.asarray([[True, True, True]])
    assert pck(pred, gt, vis2, 10.0, threshold=0.5) == pytest.approx(2 / 3)


def test_oks_ap_perfect():
    rng = np.random.default_rng(1)
    gts = []
    preds = []
    for _ in range(3):
        kps = rng.uniform(0, 200, (2, 17, 2)).astype(np.float32)
        vis = np.ones((2, 17), bool)
        areas = np.asarray([5000.0, 8000.0], np.float32)
        gts.append((kps, vis, areas))
        preds.append((kps.copy(), np.asarray([0.9, 0.8], np.float32)))
    res = oks_ap(preds, gts)
    assert res["mAP"] == pytest.approx(1.0)


def test_evaluate_cli_on_synthetic_coco(tmp_path, rng):
    """End-to-end: synthetic 2-image COCO dataset through the real
    pipeline (SSD real weights on CPU) — the CLI must run, emit the JSON
    schema, and produce AP values in [0, 1] (or NaN when no gt)."""
    import cv2

    from human_body_proportion_estimation_tpu.cli import evaluate

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(2):
        frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), frame)
        images.append({"id": i, "file_name": f"im{i}.jpg",
                       "width": 160, "height": 120})
        kp = np.concatenate(
            [rng.uniform(10, 100, (17, 2)), np.full((17, 1), 2)], axis=1
        ).reshape(-1).tolist()
        annotations.append({
            "id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "bbox": [10.0, 10.0, 60.0, 90.0], "area": 5400.0,
            "keypoints": kp,
        })
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(coco))

    res = evaluate.main([
        "--annotations", str(ann_path),
        "--images-dir", str(img_dir),
        "--detector", "ssd_mobilenet",
        "--batch-size", "2",
        "--no-compile-cache",
    ])
    assert res["images"] == 2
    assert res["missing_files"] == 0
    for key in ("box_mAP", "box_AP50", "kp_mAP", "PCK@0.1diag"):
        assert key in res
        v = res[key]
        assert np.isnan(v) or 0.0 <= v <= 1.0
