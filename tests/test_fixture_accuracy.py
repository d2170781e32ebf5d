"""End-to-end accuracy on the reference height fixtures (VERDICT #3).

The reference's implicit ground truth is encoded in fixture filenames:
`dave_bautista_193.jpg` / `zack_snyder_170.jpg` are single subjects of
known height (SURVEY §4/§6). With REAL detector+pose weights the segment
dict must be physically plausible at those heights.

The sandbox has no network access, so no real EfficientDet/HRNet
checkpoint exists here; this suite activates when one is provided:

    python -m human_body_proportion_estimation_tpu.cli.import_weights \
        --efficientdet-ckpt ... --hrnet-torch ... --out /ckpt
    HBPE_CHECKPOINT_DIR=/ckpt python -m pytest tests/test_fixture_accuracy.py

Until then it is skipped with that instruction (the detection stage is
separately golden-tested on these fixtures with the real SSD weights in
test_video_and_goldens.py).
"""

import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("HBPE_CHECKPOINT_DIR")

pytestmark = pytest.mark.skipif(
    not CKPT_DIR,
    reason="needs real det+pose weights: set HBPE_CHECKPOINT_DIR to an "
           "orbax dir produced by cli.import_weights (no network in this "
           "sandbox to fetch upstream checkpoints)",
)

FIXTURES = {
    "dave_bautista": ("/root/reference/media/imgs/dave_bautista_193.jpg",
                      193.0),
    "zack_snyder": ("/root/reference/media/imgs/zack_snyder_170.jpg",
                    170.0),
}

# physical plausibility bands (cm) for a standing adult at the encoded
# heights; generous enough for pose noise, tight enough that random
# weights or unit errors cannot pass
BANDS = {
    "shoulder": (25.0, 60.0),
    "torso": (35.0, 80.0),
    "rhip_lhip": (15.0, 45.0),
    "lhip_lknee": (30.0, 65.0),
    "rhip_rknee": (30.0, 65.0),
}


@pytest.fixture(scope="module")
def real_pipeline():
    from human_body_proportion_estimation_tpu.models import weights as W
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    det_vars, pose_vars = W.load_pipeline_checkpoint(CKPT_DIR)
    pipe = InferencePipeline(det_vars=det_vars, pose_vars=pose_vars)
    assert pipe.weights_origin == {"detector": "real", "pose": "real"}
    return pipe


@pytest.mark.parametrize("name", list(FIXTURES))
def test_height_fixture_plausibility(real_pipeline, name):
    import cv2

    from human_body_proportion_estimation_tpu.ops import (
        proportions as prop_ops,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        format_image_result,
    )

    path, height_cm = FIXTURES[name]
    img = cv2.imread(path)[..., ::-1]
    out = real_pipeline.infer_images([img], height_cm, det_threshold=0.7)
    result = format_image_result(out, 0)
    dicts = result[2:]
    assert dicts, f"no person detected in {name}"
    d = dicts[0]
    for seg, (lo, hi) in BANDS.items():
        v = d[seg]
        assert v != prop_ops.NOT_VISIBLE, f"{name}: {seg} not visible"
        assert lo <= v <= hi, f"{name}: {seg}={v:.1f}cm outside [{lo},{hi}]"


def test_two_people_detects_two(real_pipeline):
    import cv2

    img = cv2.imread("/root/reference/media/imgs/two people.jpg")[..., ::-1]
    out = real_pipeline.infer_images([img], 175.0, det_threshold=0.7)
    assert int(np.asarray(out.person_valid[0]).sum()) == 2


# ---- bottom-up variant (beyond reference): activates when a HigherHRNet
# checkpoint is supplied via HBPE_BOTTOMUP_CHECKPOINT_DIR
# (cli.import_weights --higherhrnet-torch ... --out <dir>) ----

BU_CKPT_DIR = os.environ.get("HBPE_BOTTOMUP_CHECKPOINT_DIR")


@pytest.mark.skipif(
    not BU_CKPT_DIR,
    reason="needs real HigherHRNet weights: set "
           "HBPE_BOTTOMUP_CHECKPOINT_DIR to a cli.import_weights "
           "--higherhrnet-torch output dir",
)
def test_bottomup_two_people_groups_two():
    import cv2

    from human_body_proportion_estimation_tpu.models import weights as W
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )

    _, pose_vars = W.load_pipeline_checkpoint(BU_CKPT_DIR)
    pipe = BottomUpPipeline(pose_vars=pose_vars)
    assert pipe.weights_origin == {"pose": "real"}
    img = cv2.imread("/root/reference/media/imgs/two people.jpg")[..., ::-1]
    out = pipe.infer_images([img], person_heights=175.0)
    assert int(np.asarray(out.person_valid[0]).sum()) == 2
    # both grouped persons must have most keypoints visible
    for slot in range(3):
        if out.person_valid[0, slot]:
            assert int(out.kp_visible[0, slot].sum()) >= 10
