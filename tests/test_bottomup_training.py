"""Bottom-up training (training/bottomup.py): target construction, AE
loss semantics, and an end-to-end sharded train step on the tiny config."""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.training import bottomup as bu


def test_multi_person_targets_max_combine():
    kp = jnp.asarray([[[[4.0, 4.0]], [[4.0, 4.0]], [[10.0, 2.0]]]])
    vis = jnp.asarray([[[True], [True], [False]]])  # person 2 invisible
    t = bu.multi_person_heatmap_targets(kp, vis, 16, 16, sigma=1.0)
    assert t.shape == (1, 16, 16, 1)
    t = np.asarray(t[0, :, :, 0])
    assert t[4, 4] == pytest.approx(1.0)       # overlap maxes at 1, not 2
    # invisible person: no blob (only the visible persons' far tail)
    assert t[2, 10] == pytest.approx(0.0, abs=1e-6)
    assert t.max() == pytest.approx(1.0)


def test_ae_loss_separated_tags_is_low_and_collapsed_is_high():
    k, h, w = 3, 16, 16
    kp = np.zeros((1, 2, k, 2), np.float32)
    kp[0, 0] = [[2, 2], [3, 7], [2, 12]]
    kp[0, 1] = [[12, 2], [11, 7], [12, 12]]
    vis = jnp.ones((1, 2, k), bool)

    def tags_with(v0, v1):
        tg = np.zeros((1, h, w, k), np.float32)
        for j, (x, y) in enumerate(kp[0, 0]):
            tg[0, int(y), int(x), j] = v0
        for j, (x, y) in enumerate(kp[0, 1]):
            tg[0, int(y), int(x), j] = v1
        return jnp.asarray(tg)

    good = bu.ae_loss(tags_with(-3.0, 3.0), jnp.asarray(kp), vis)
    bad = bu.ae_loss(tags_with(1.0, 1.0), jnp.asarray(kp), vis)
    assert float(good) < 1e-6       # tight clusters, far apart
    assert float(bad) > 0.4         # collapsed means: push saturates


def test_ae_loss_ignores_padded_person_slots():
    k = 2
    kp = jnp.asarray(np.random.default_rng(0).uniform(0, 15, (1, 3, k, 2)),
                     jnp.float32)
    vis = jnp.asarray([[[True] * k, [False] * k, [False] * k]])
    tags = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (1, 16, 16, k)), jnp.float32
    )
    one = bu.ae_loss(tags, kp, vis)
    # only one valid person: no push pairs; pull uses only slot 0
    vis0 = jnp.asarray([[[True] * k]])
    lone = bu.ae_loss(tags, kp[:, :1], vis0)
    np.testing.assert_allclose(float(one), float(lone), rtol=1e-6)


def test_sharded_bottomup_train_step_runs_and_learns():
    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNet,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import HRNET_W32
    from tests.tiny_models import tiny_w32_config
    from human_body_proportion_estimation_tpu.parallel import mesh as M
    from human_body_proportion_estimation_tpu.training.trainer import (
        create_train_state,
    )

    # depth-reduced W32 (same branches/channels — TP stays non-vacuous):
    # this certifies the sharded AE train-step machinery, not model
    # scale; full-depth evidence is the chip certification (certify.py)
    model = HigherHRNet(config=tiny_w32_config(), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    h, w = 64, 32
    state, tx = create_train_state(model, rng, (1, h, w, 3), 1e-3)
    mesh = M.make_mesh(8, model_parallel=2)
    step_fn, sstate = bu.make_sharded_bottomup_step(model, tx, state, mesh)

    b, p, k = 8, 3, HRNET_W32.num_keypoints
    imgs = jax.random.uniform(rng, (b, h, w, 3))
    kp = jax.random.uniform(rng, (b, p, k, 2)) * jnp.asarray(
        [w / 1.0, h / 1.0]
    )
    vis = jnp.ones((b, p, k), bool).at[:, 2].set(False)

    losses = []
    for _ in range(3):
        sstate, loss = step_fn(sstate, imgs, kp, vis)
        losses.append(float(jax.device_get(loss)))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]   # same batch: loss must decrease
