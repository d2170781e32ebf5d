"""Data-parallel serving over a mesh: results identical to single-device."""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow

import jax

from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )


def test_sharded_serving_matches_single_device(cfg, rng):
    mesh = make_mesh(8)  # 8-way data parallel on the virtual CPU mesh
    from tests.tiny_models import make_tiny_pipeline

    # depth-reduced models: shard==single equality is depth-independent
    single = make_tiny_pipeline(cfg=cfg, rng_seed=0)
    sharded = make_tiny_pipeline(cfg=cfg, rng_seed=0, mesh=mesh)

    imgs = [rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
            for _ in range(8)]
    a = single.infer_serving(imgs, 175.0, 0.0)
    b = sharded.infer_serving(imgs, 175.0, 0.0)
    assert a.shape == b.shape == (8, 3, 23)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # outputs really were computed sharded over the data axis
    packed = sharded._serving_program()(
        sharded.det_vars, sharded.pose_vars,
        *_device_args(sharded, imgs),
    )
    assert len(packed.sharding.device_set) == 8


def _device_args(pipe, imgs):
    import jax.numpy as jnp

    batch, thresholds, heights, orig_hw, _ = pipe._prepare(imgs, 175.0, 0.0)
    return (jnp.asarray(batch), jnp.asarray(thresholds),
            jnp.asarray(heights), jnp.asarray(orig_hw))


def test_sharded_batch_rounds_to_shard_multiple(cfg, rng):
    mesh = make_mesh(8)
    from tests.tiny_models import make_tiny_pipeline

    pipe = make_tiny_pipeline(cfg=cfg, mesh=mesh)
    # 3 images must still work (padded up to a multiple of 8)
    imgs = [rng.integers(0, 256, (100, 100, 3), dtype=np.uint8)
            for _ in range(3)]
    out = pipe.infer_serving(imgs, 175.0, det_threshold=1.1)
    assert out.shape == (3, 3, 23)
    assert not np.any(out[:, :, 0] > 0.5)  # no persons at threshold 1.1
