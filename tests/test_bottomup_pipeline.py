"""Bottom-up pipeline (HigherHRNet + AE grouping): shape/contract tests on
a tiny config, plus an end-to-end grouping check with a stubbed model.

Beyond-reference capability (the reference discards the AE tags,
pose_est_hrnet_trtserver.py:22-28), so correctness is established by the
ae_grouping oracle tests; here we pin the pipeline contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.pipeline.bottomup import (
    BottomUpOutputs,
    BottomUpPipeline,
)
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)


@pytest.fixture(scope="module")
def pipe():
    cfg = PipelineConfig(
        detector=DetectorConfig(max_persons=3),
        pose=PoseConfig(),
    )
    from tests.tiny_models import tiny_higherhrnet

    # depth-reduced model: these are shape/contract tests on random
    # weights; full-depth evidence lives in torch forward-equivalence
    p = BottomUpPipeline(cfg, model=tiny_higherhrnet())
    p.INPUT_HW = (128, 128)  # tiny input for CPU tests
    return p


def test_forward_shapes_and_masks(pipe):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
            for _ in range(2)]
    out = pipe.infer_images(imgs, person_heights=175.0)
    assert isinstance(out, BottomUpOutputs)
    b, p = 2, 3
    assert out.keypoints.shape == (b, p, 17, 2)
    assert out.lengths_cm.shape == (b, p, 11)
    assert out.person_valid.shape == (b, p)
    # masks consistent: lengths only where visible; all finite
    assert np.isfinite(out.lengths_cm).all()
    assert (out.lengths_cm[~out.seg_visible] == 0).all()
    assert not out.seg_visible[~out.person_valid].any()


def test_grouping_drives_outputs(pipe):
    """Bypass the model: synthetic aggregated heatmaps/tags through the
    same decode path used by forward()."""
    from human_body_proportion_estimation_tpu.ops import ae_grouping as ae

    k, h, w = 17, 64, 64
    heat = np.zeros((k, h, w), np.float32)
    tags = np.zeros((k, h, w), np.float32)
    # one person: strong peaks at distinct rows, tag 1.5 everywhere
    coords = [(8 + j, 10 + 2 * j) for j in range(k)]
    for j, (cx, cy) in enumerate(coords):
        heat[j, cy, cx] = 1.0
        tags[j, cy, cx] = 1.5
    out = ae.decode_bottom_up(
        jnp.asarray(heat), jnp.asarray(tags), max_people=3,
        score_threshold=0.5, tag_threshold=1.0,
    )
    valid = np.asarray(out.valid)
    assert valid.tolist() == [True, False, False]
    got = np.asarray(out.keypoints[0]).astype(int)
    assert [tuple(r) for r in got] == coords
