"""Data-parallel bottom-up serving on the 8-device CPU mesh: sharded
output must match the single-device run (tolerance-based — conv batching
differs per shard) and actually span all devices."""

import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.parallel import mesh as M
from human_body_proportion_estimation_tpu.pipeline.bottomup import (
    BottomUpPipeline,
)


def test_bottomup_dp_sharded_matches_single_device():
    mesh = M.make_mesh(8)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
            for _ in range(8)]

    # f32: bf16 accumulation-order drift between batch-8 and per-shard
    # convs reaches ~15% through the deep trunk and would swamp the check.
    # Depth-reduced W32 (same branches/channels): the property under test
    # is shard==single EQUALITY of the dp program, which is depth-
    # independent; full-depth forward evidence lives in the torch
    # forward-equivalence and chip certification suites.
    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNet,
    )
    from tests.tiny_models import tiny_w32_config

    tiny = HigherHRNet(config=tiny_w32_config(), dtype=jnp.float32)
    single = BottomUpPipeline(rng_seed=0, dtype=jnp.float32, model=tiny)
    single.INPUT_HW = (128, 128)
    sharded = BottomUpPipeline(rng_seed=0, mesh=mesh, dtype=jnp.float32,
                               model=tiny)
    sharded.INPUT_HW = (128, 128)

    # packed outputs pass hard peak/validity thresholds, so with RANDOM
    # weights a noise peak near score_threshold can flip between the
    # batch-8 and per-shard conv numerics; compare the CONTINUOUS model
    # outputs instead (grouping determinism is covered by the ae_grouping
    # oracle tests) and check the packed serving path structurally
    batch, heights, orig_hw, _ = sharded._prepare(imgs, 175.0)
    x = jnp.asarray(batch).astype(jnp.float32) / 255.0

    ref_out = single.model.apply(single.pose_vars, x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_apply = jax.jit(
        sharded.model.apply,
        in_shardings=(
            jax.tree.map(lambda _: NamedSharding(mesh, P()),
                         sharded.pose_vars),
            sharded._data_sharding,
        ),
    )
    got_out = sharded_apply(sharded.pose_vars, x)
    # per-shard conv batching changes f32 reduction order: drift measured
    # at <=2e-3 absolute on ~1e2-magnitude activations
    for k in ("output_1", "output_2"):
        np.testing.assert_allclose(
            np.asarray(ref_out[k]), np.asarray(got_out[k]),
            rtol=1e-3, atol=5e-3,
        )

    ref = single.infer_serving(imgs, 175.0)
    got = sharded.infer_serving(imgs, 175.0)
    assert ref.shape == got.shape == (8, 3, 23)

    packed = sharded._serving(
        sharded.pose_vars, jnp.asarray(batch), jnp.asarray(heights),
        jnp.asarray(orig_hw),
    )
    assert len(packed.sharding.device_set) == 8
