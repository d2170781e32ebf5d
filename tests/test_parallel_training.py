"""Mesh/sharding + sharded train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


from human_body_proportion_estimation_tpu.models.hrnet import HRNet
from human_body_proportion_estimation_tpu.parallel import mesh as M
from human_body_proportion_estimation_tpu.training import trainer as T


def test_make_mesh_shapes():
    mesh = M.make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = M.make_mesh(8)
    assert mesh1.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        M.make_mesh(6, model_parallel=4)


def test_param_sharding_rule():
    mesh = M.make_mesh(8, model_parallel=2)
    tree = {
        "big_conv": jnp.zeros((3, 3, 32, 128)),
        "small_conv": jnp.zeros((3, 3, 3, 32)),
        "bn_scale": jnp.zeros((128,)),
    }
    sh = M.param_shardings(tree, mesh)
    assert sh["big_conv"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    assert sh["small_conv"].spec == jax.sharding.PartitionSpec()
    assert sh["bn_scale"].spec == jax.sharding.PartitionSpec("model")


def test_heatmap_targets_peak_location():
    kp = jnp.asarray([[[5.0, 7.0], [0.0, 0.0]]])  # (x, y)
    vis = jnp.asarray([[True, False]])
    hm = T.heatmap_targets(kp, vis, 16, 12)
    assert hm.shape == (1, 16, 12, 2)
    peak = np.unravel_index(np.argmax(np.asarray(hm[0, :, :, 0])), (16, 12))
    assert peak == (7, 5)  # (y, x)
    np.testing.assert_allclose(np.asarray(hm[0, :, :, 1]), 0.0)


def test_sharded_train_step_runs_and_descends():
    # Depth-reduced W32 (same four branches / channel widths, so the TP
    # partitioning below is non-vacuous): this test certifies the sharded
    # train-step machinery, not model scale — full-depth W32 training is
    # certified on the real chip (cli/certify.py). ~5x suite-time cut.
    from tests.tiny_models import tiny_w32_config

    model = HRNet(config=tiny_w32_config(), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state, tx = T.create_train_state(model, rng, (1, 64, 32, 3), 1e-3)

    mesh = M.make_mesh(8, model_parallel=2)
    step_fn, sstate = T.make_sharded_train_step(model, tx, state, mesh)

    imgs = jax.random.uniform(rng, (8, 64, 32, 3))
    kp = jax.random.uniform(rng, (8, 17, 2)) * jnp.asarray([8.0, 16.0])
    targets = T.heatmap_targets(kp, jnp.ones((8, 17), bool), 16, 8)

    losses = []
    for _ in range(3):
        sstate, loss = step_fn(sstate, imgs, targets)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing the (overfit) batch
    assert int(jax.device_get(sstate.step)) == 3

    # params really are sharded over the model axis
    big = sstate.params["stage4_module0"]["fuse"]["up_3_0"]["conv"]["kernel"]
    assert len(big.sharding.device_set) >= 2
