"""Bottom-up certification plumbing (training/certify_bottomup.py):
multi-person scene invariants, IoU person matching, and the serving-path
analytic truth.

The end-to-end train->serve->assert run is `cli/certify_bottomup.py`
(--smoke on CPU, production shapes on the chip; results in BENCHMARKS.md).
These tests pin the label math that run trusts.
"""

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.training.certify_bottomup import (
    bottomup_arrays,
    bottomup_path_truth_cm,
    make_multi_scenes,
    match_persons_iou,
)
from human_body_proportion_estimation_tpu.training.synthetic import (
    MultiPersonScene,
    SyntheticScene,
    generate_multi_scene,
    segment_truth_cm,
)


# --------------------------------------------------------------------- #
# scene generator invariants


def test_multi_scene_boxes_disjoint_and_keypoints_inside():
    rng = np.random.default_rng(3)
    for _ in range(8):
        sc = generate_multi_scene(rng, (256, 256), max_people=3)
        p = sc.keypoints.shape[0]
        assert 1 <= p <= 3
        assert sc.visible.all()
        b = sc.bboxes_xyxy
        for i in range(p):
            # keypoints inside (a small slack: the box is the DRAWN extent,
            # keypoints are the skeleton within it)
            assert (sc.keypoints[i, :, 0] >= b[i, 0] - 1).all()
            assert (sc.keypoints[i, :, 0] <= b[i, 2] + 1).all()
            assert (sc.keypoints[i, :, 1] >= b[i, 1] - 1).all()
            assert (sc.keypoints[i, :, 1] <= b[i, 3] + 1).all()
            # box in frame
            assert b[i, 0] >= 0 and b[i, 1] >= 0
            assert b[i, 2] <= 256 and b[i, 3] <= 256
            for j in range(i + 1, p):
                ix = min(b[i, 2], b[j, 2]) - max(b[i, 0], b[j, 0])
                assert ix <= 0, "person boxes must not overlap"


def test_multi_scene_shared_height_contract():
    scenes = make_multi_scenes(4, seed=7, img_hw=(128, 128), max_people=3)
    for sc in scenes:
        # one declared height per scene (the HTTP form contract)
        assert np.unique(sc.heights_cm).size == 1


def test_bottomup_arrays_pads_person_slots():
    scenes = make_multi_scenes(3, seed=1, img_hw=(96, 96), n_people=2,
                               max_people=2)
    imgs, kp, vis = bottomup_arrays(scenes, max_people=3)
    assert imgs.shape == (3, 96, 96, 3) and imgs.dtype == np.uint8
    assert kp.shape == (3, 3, 17, 2) and vis.shape == (3, 3, 17)
    assert vis[:, :2].all() and not vis[:, 2].any()
    assert (kp[:, 2] == 0).all()


# --------------------------------------------------------------------- #
# IoU person matching


def test_match_persons_iou_greedy_and_convention():
    # pipeline emits yxyx, truth is xyxy; identical boxes must match
    true_boxes = np.array([[10.0, 20.0, 50.0, 90.0],
                           [60.0, 20.0, 95.0, 90.0]])
    pred = np.array([[20.0, 60.0, 90.0, 95.0],    # yxyx of true[1]
                     [20.0, 10.0, 90.0, 50.0],    # yxyx of true[0]
                     [0.0, 0.0, 5.0, 5.0]])
    valid = np.array([True, True, True])
    m = match_persons_iou(pred, valid, true_boxes)
    assert m == [1, 0]


def test_match_persons_iou_skips_invalid_and_unmatched():
    true_boxes = np.array([[10.0, 20.0, 50.0, 90.0],
                           [200.0, 200.0, 240.0, 250.0]])
    pred = np.array([[20.0, 10.0, 90.0, 50.0],
                     [20.0, 10.0, 90.0, 50.0]])
    valid = np.array([False, True])           # slot 0 invalid
    m = match_persons_iou(pred, valid, true_boxes)
    assert m[0] == 1                           # best VALID slot
    assert m[1] == -1                          # nothing near true[1]


def test_match_persons_iou_never_reuses_a_slot():
    true_boxes = np.array([[10.0, 10.0, 50.0, 50.0],
                           [12.0, 12.0, 52.0, 52.0]])
    pred = np.array([[10.0, 10.0, 50.0, 50.0]])
    m = match_persons_iou(pred, np.array([True]), true_boxes)
    assert sorted(m) == [-1, 0]


# --------------------------------------------------------------------- #
# serving-path truth


def test_path_truth_matches_analytic_within_quantization():
    """Path truth (keypoints snapped to the aggregated-heatmap grid) must
    agree with raw analytic segment truth up to the quantization bound the
    grid implies, once both use the same pixel->cm scale convention."""
    rng = np.random.default_rng(11)
    sc = generate_multi_scene(rng, (512, 512), n_people=1)
    kp, vis = sc.keypoints[0], sc.visible[0]
    H = float(sc.heights_cm[0])
    input_hw = (512, 512)

    truth_path, vis_path = bottomup_path_truth_cm(
        kp, vis, H, input_hw, sc.image.shape[:2])
    assert vis_path.all()

    # raw truth under the SAME scale rule (visible-keypoint y-extent)
    ys = kp[vis, 1]
    px_to_cm = H / max(float(ys.max() - ys.min()), 1.0)
    from human_body_proportion_estimation_tpu.ops.proportions import (
        _P1, _P2)
    seg_px = np.linalg.norm(_P1 @ kp - _P2 @ kp, axis=-1)
    raw_cm = seg_px * px_to_cm

    # grid pitch: orig px per heatmap bin (hm = input/2), worst case both
    # endpoints off by half a bin in x and y, plus the scale shift from
    # the extent itself quantizing
    pitch = 512 / (input_hw[0] // 2)
    bound_cm = (2 * pitch * px_to_cm) * 1.5 + 1.0
    assert np.abs(truth_path - raw_cm).max() < bound_cm


def test_path_truth_identity_when_keypoints_on_grid():
    """Keypoints placed exactly on heatmap-bin centers pass through the
    snap unchanged -> path truth == exact proportions math."""
    input_hw = (128, 128)
    orig_hw = (128, 128)  # sx = sy = 2.0 (hm 64x64)
    rng = np.random.default_rng(5)
    kp_bins = rng.integers(4, 60, (17, 2)).astype(np.float64)
    kp = kp_bins * 2.0                      # exactly on the bin lattice
    vis = np.ones(17, bool)
    H = 180.0
    truth, tvis = bottomup_path_truth_cm(kp, vis, H, input_hw, orig_hw)

    from human_body_proportion_estimation_tpu.ops.proportions import (
        _P1, _P2)
    ys = kp[:, 1]
    px_to_cm = H / (ys.max() - ys.min())
    exact = np.linalg.norm(_P1 @ kp - _P2 @ kp, axis=-1) * px_to_cm
    np.testing.assert_allclose(truth, exact.astype(np.float32), rtol=1e-5)
    assert tvis.sum() >= 10  # zero-length segments (if any) masked


def test_single_person_multi_scene_matches_single_scene_truth():
    """A 1-person MultiPersonScene's analytic truth agrees with the
    single-person SyntheticScene truth convention (same segment math)."""
    rng = np.random.default_rng(23)
    ms = generate_multi_scene(rng, (256, 256), n_people=1)
    shim = SyntheticScene(
        image=ms.image, keypoints=ms.keypoints[0], visible=ms.visible[0],
        bbox_xyxy=ms.bboxes_xyxy[0], height_cm=float(ms.heights_cm[0]),
    )
    truth, vis = segment_truth_cm(shim)
    assert vis.all()
    assert np.isfinite(truth).all() and (truth[vis] > 0).all()
