"""CLI drivers: end-to-end smoke with structure/parity checks on CPU."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    for name, shape in [("a_240x320.jpg", (240, 320, 3)),
                        ("b_200x200.jpg", (200, 200, 3))]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        cv2.imwrite(str(d / name), img)
    return str(d)


@pytest.fixture(scope="module")
def tiny_pipeline():
    # canonical tiny shapes + depth-reduced models (tests/tiny_models.py)
    from tests.tiny_models import make_tiny_pipeline

    return make_tiny_pipeline()


def test_run_pdet_pose_structure_and_rendering(media_dir, tiny_pipeline,
                                               tmp_path):
    from human_body_proportion_estimation_tpu.cli.detect_pose import (
        run_pdet_pose,
    )

    out_dir = str(tmp_path / "out")
    results = run_pdet_pose(
        media_dir,
        person_height=[175],
        det_threshold=0.0,   # random weights: accept anything
        save_result_dir=out_dir,
        pipeline=tiny_pipeline,
        debug=False,
    )
    assert len(results) == 2  # two images
    for res in results:
        boxes, heatmaps = res[0], res[1]
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert len(res) - 2 == boxes.shape[0]  # one dict per person
        for d in res[2:]:
            assert set(d) == {
                "shoulder", "torso", "lshoulder_lelbow", "rshoulder_relbow",
                "lwrist_lelbow", "rwrist_relbow", "rhip_lhip", "rhip_rknee",
                "lhip_lknee", "rankle_rknee", "lankle_lknee",
            }
    # every frame rendered (reference's counter bug not replicated)
    files = os.listdir(os.path.join(out_dir, "tpu_pdet_pose"))
    assert "frame_000000.jpg" in files and "frame_000001.jpg" in files


def test_run_pdet_pose_bytes_input(media_dir, tiny_pipeline):
    from human_body_proportion_estimation_tpu.cli.detect_pose import (
        run_pdet_pose,
    )

    with open(os.path.join(media_dir, "a_240x320.jpg"), "rb") as f:
        data = f.read()
    results = run_pdet_pose(
        data, det_threshold=1.1, pipeline=tiny_pipeline, debug=False
    )
    assert len(results) == 1
    assert len(results[0]) == 2  # no humans -> boxes + heatmaps only


def test_run_demo_odet_edet(media_dir, tmp_path):
    from human_body_proportion_estimation_tpu.cli.detect_edet import (
        run_demo_odet,
    )

    out = run_demo_odet(
        media_dir,
        det_threshold=0.0,
        save_result_dir=str(tmp_path / "det"),
        detector_name="efficientdet_lite0",
        debug=False,
        input_hw=(128, 128),
    )
    assert len(out) == 2
    boxes, scores, classes = out[0]
    assert boxes.shape[1] == 4
    assert np.all(scores[1:] <= scores[:1] + 1e-6) if len(scores) > 1 else True
    files = os.listdir(str(tmp_path / "det" / "tpu_efficientdet_lite0"))
    assert len([f for f in files if f.startswith("frame_")]) == 2


def test_run_demo_pose_est(media_dir, tmp_path):
    from human_body_proportion_estimation_tpu.cli.pose_est import (
        run_demo_pose_est,
    )

    single = os.path.join(media_dir, "a_240x320.jpg")
    out = run_demo_pose_est(
        single, save_result_dir=str(tmp_path / "pose"), debug=False
    )
    assert len(out) == 1
    kp, scores, heatmap = out[0]
    assert kp.shape == (17, 2) and heatmap.shape == (17, 96, 72)
    files = os.listdir(str(tmp_path / "pose" / "tpu_hrnet_w32"))
    assert "heatmap_000000.jpg" in files and "frame_000000.jpg" in files


def test_run_demo_odet_yolo(media_dir, tmp_path):
    from human_body_proportion_estimation_tpu.cli.detect_yolo import (
        run_demo_odet,
    )

    out = run_demo_odet(
        os.path.join(media_dir, "b_200x200.jpg"),
        det_threshold=0.4,
        save_result_dir=str(tmp_path / "yolo"),
        model_name="yolov5s",
        debug=False,
    )
    assert len(out) == 1
    boxes, scores, classes = out[0]
    # boxes (if any survived NMS on random weights) are inside the image
    if len(boxes):
        assert np.all(boxes >= 0) and np.all(boxes[:, [0, 2]] <= 200)


def test_parser_accepts_reference_flags():
    """-ox/--onnx_path and -c/--num_classes exist for reference CLI parity
    (`modules/utils.py:94-103`); -ox is a documented no-op."""
    from human_body_proportion_estimation_tpu.cli.args import build_parser

    p = build_parser("t")
    args = p.parse_args(
        ["-i", "x.jpg", "-ox", "yolov5/yolov5s.onnx", "-c", "3"]
    )
    assert args.onnx_path == "yolov5/yolov5s.onnx"
    assert args.num_classes == 3


def test_class_color_matches_reference_seed_scheme():
    """class_color reproduces the reference's seeded BGR draw
    (`obj_det_yolov5_onnx.py:56-57`) swapped into RGB."""
    from human_body_proportion_estimation_tpu.utils.draw import class_color

    for cls in (0, 7, 41):
        np.random.seed(cls + 2020)
        ref_bgr = [np.random.randint(0, 255), 0, np.random.randint(0, 255)]
        assert class_color(cls) == (ref_bgr[2], ref_bgr[1], ref_bgr[0])
    # deterministic across calls
    assert class_color(0) == class_color(0)
