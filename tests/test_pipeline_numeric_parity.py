"""Config-4 numeric parity: the fused program's pixel->cm tail must equal
an independent host-side recomputation of the reference driver math
(person_det_pose_edet4_trtserver.py:148-171) from the SAME keypoints and
boxes the device emitted."""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)
from tests.test_ops_proportions import oracle_dist_dict


@pytest.fixture(scope="module")
def pipeline():
    # real-weight SSD detector -> genuine person boxes on the fixture
    cfg = PipelineConfig(
        detector=DetectorConfig(name="ssd_mobilenet"),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    from tests.tiny_models import tiny_hrnet

    # real-weight SSD detector + depth-reduced pose (random weights
    # either way; the property under test is pipeline math, not depth)
    return InferencePipeline(config=cfg, pose=tiny_hrnet())


def test_device_tail_matches_reference_math(pipeline, rng):
    import os

    import cv2

    fixture = "/root/reference/media/imgs/two people.jpg"
    if not os.path.exists(fixture):
        pytest.skip("reference fixture unavailable")
    imgs = [
        cv2.imread(fixture)[..., ::-1],
        rng.integers(0, 256, (240, 320, 3), dtype=np.uint8),
    ]
    height_cm = 183.0
    out = pipeline.infer_images(imgs, height_cm, det_threshold=0.5)

    checked = 0
    for i in range(2):
        for slot in range(3):
            if not bool(out.person_valid[i, slot]):
                continue
            kp = np.asarray(out.keypoints[i, slot])      # image-space px
            vis = np.asarray(out.kp_visible[i, slot])
            box = np.asarray(out.boxes_orig[i, slot])     # yxyx px

            # reference math recomputed on the host
            y1, y2 = int(box[0]), int(box[2])
            pixel_to_cm = height_cm / max(y2 - y1, 1)
            ignored = {k for k in range(17) if not vis[k]}
            expect = oracle_dist_dict(kp, ignored, pixel_to_cm)

            lengths = np.asarray(out.lengths_cm[i, slot])
            seg_vis = np.asarray(out.seg_visible[i, slot])
            from human_body_proportion_estimation_tpu.ops.proportions import (
                to_dist_dict,
            )

            got = to_dist_dict(lengths, seg_vis)
            for name, val in expect.items():
                if isinstance(val, str):
                    assert got[name] == val, (name, got[name])
                else:
                    np.testing.assert_allclose(
                        got[name], val, rtol=1e-3, atol=0.05,
                        err_msg=f"img {i} slot {slot} {name}",
                    )
            checked += 1
    assert checked >= 1, "no persons found at threshold 0 (random weights?)"
