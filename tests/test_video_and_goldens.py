"""Video-mode pipeline + golden regression fixtures for the real-weight SSD.

The goldens freeze the SSD detector's outputs on the reference fixture
images (the only accuracy-bearing path available offline); any numerics
change in the model, NMS, or import shows up as a diff here.
"""

import json
import os

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data",
                           "ssd_goldens.json")
FIXTURES = {
    "two_people": "/root/reference/media/imgs/two people.jpg",
    "dave_bautista_193": "/root/reference/media/imgs/dave_bautista_193.jpg",
    "zack_snyder_170": "/root/reference/media/imgs/zack_snyder_170.jpg",
}


# --------------------------------------------------------------------- #
# video


@pytest.fixture(scope="module")
def tiny_pipeline():

    # canonical tiny shapes + depth-reduced models (tests/tiny_models.py)
    from tests.tiny_models import make_tiny_pipeline

    return make_tiny_pipeline()


def test_video_mode_end_to_end(tiny_pipeline, tmp_path, rng):
    import cv2

    from human_body_proportion_estimation_tpu.cli.detect_pose import (
        run_pdet_pose,
    )

    vid_path = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(
        vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (128, 96)
    )
    for _ in range(5):
        writer.write(rng.integers(0, 256, (96, 128, 3), dtype=np.uint8))
    writer.release()

    out_dir = str(tmp_path / "out")
    results = run_pdet_pose(
        vid_path, inference_mode="video", det_threshold=0.0,
        save_result_dir=out_dir, pipeline=tiny_pipeline, debug=False,
        batch_size=4,
    )
    assert len(results) == 5
    assert os.path.exists(
        os.path.join(out_dir, "tpu_pdet_pose", "res_video.mp4")
    )


def test_video_frame_cap():
    from human_body_proportion_estimation_tpu.utils import io as media_io

    assert media_io.MAX_VIDEO_FRAMES == 10_000  # reference cap


# --------------------------------------------------------------------- #
# SSD goldens


@pytest.fixture(scope="module")
def ssd_detector():
    from human_body_proportion_estimation_tpu.models.tflite_import import (
        DEFAULT_TFLITE_PATH,
    )

    if not os.path.exists(DEFAULT_TFLITE_PATH):
        pytest.skip("reference ssd.tflite not available")
    from human_body_proportion_estimation_tpu.pipeline.human_detector import (
        HumanDetectorSSD,
    )

    return HumanDetectorSSD(threshold=0.5)


def _current_detections(det):
    import cv2

    out = {}
    for name, path in FIXTURES.items():
        img = cv2.imread(path)[..., ::-1]
        boxes, scores = det.get_detections(img)
        out[name] = {
            "boxes": np.round(boxes, 5).tolist(),
            "scores": np.round(scores, 5).tolist(),
        }
    return out


def test_ssd_goldens_regression(ssd_detector):
    current = _current_detections(ssd_detector)
    if os.environ.get("HBPE_UPDATE_GOLDENS"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(current, f, indent=1)
        pytest.skip("goldens regenerated (HBPE_UPDATE_GOLDENS set); "
                    "rerun without the flag to compare")
    # a missing golden is a FAILURE, not a bootstrap: silently
    # re-baselining would erase the regression the golden exists to catch
    assert os.path.exists(GOLDEN_PATH), (
        f"golden file {GOLDEN_PATH} missing — it is committed; "
        "regenerate deliberately with HBPE_UPDATE_GOLDENS=1"
    )
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for name in FIXTURES:
        g, c = golden[name], current[name]
        assert len(g["scores"]) == len(c["scores"]), name
        np.testing.assert_allclose(
            c["scores"], g["scores"], atol=1e-3, err_msg=name
        )
        np.testing.assert_allclose(
            c["boxes"], g["boxes"], atol=1e-3, err_msg=name
        )


def test_ssd_finds_subjects_in_height_fixtures(ssd_detector):
    # the filenames encode ground truth: each contains >= 1 person
    import cv2

    for name in ("dave_bautista_193", "zack_snyder_170"):
        img = cv2.imread(FIXTURES[name])[..., ::-1]
        boxes, scores = ssd_detector.get_detections(img)
        assert len(boxes) >= 1, name
        assert scores.max() > 0.5, name
