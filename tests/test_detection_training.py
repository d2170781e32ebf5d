"""Detector training (training/detection.py): anchor matching oracle,
target/decode round trip, focal-loss semantics, and a sharded train step
that descends on a tiny overfit task (8-device virtual CPU mesh)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


from human_body_proportion_estimation_tpu.models import efficientdet as E
from human_body_proportion_estimation_tpu.models.anchors import (
    AnchorConfig,
    decode_boxes,
    generate_anchors,
)
from human_body_proportion_estimation_tpu.parallel import mesh as M
from human_body_proportion_estimation_tpu.training import detection as D


def test_match_anchors_oracle():
    """Hand-built case: one anchor exactly on the gt (IoU 1 -> positive),
    one far away (IoU 0 -> negative), one overlapping ~0.45 (ignored),
    and padded gt slots never matching."""
    anchors = jnp.asarray([
        [50.0, 50.0, 20.0, 20.0],    # dead-on gt 0
        [500.0, 500.0, 20.0, 20.0],  # nowhere near
        [57.6, 50.0, 20.0, 20.0],    # IoU vs gt0 = 12.4/27.6 ~ 0.449
    ])
    gt = jnp.asarray([
        [40.0, 40.0, 60.0, 60.0],
        [0.0, 0.0, 0.0, 0.0],        # padding
    ])
    valid = jnp.asarray([True, False])
    matched, state = D.match_anchors(anchors, gt, valid)
    assert state[0] == 1 and matched[0] == 0
    assert state[1] == 0
    assert state[2] == -1

    # a tiny gt below pos_iou for every anchor is still force-matched to
    # its best anchor
    gt2 = jnp.asarray([[48.0, 48.0, 52.0, 52.0],
                       [0.0, 0.0, 0.0, 0.0]])
    matched2, state2 = D.match_anchors(anchors, gt2, valid)
    assert state2[0] == 1 and matched2[0] == 0


def test_regression_targets_invert_decode():
    """regression_targets must be the exact inverse of decode_boxes."""
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(
        np.stack([
            rng.uniform(50, 200, 32), rng.uniform(50, 200, 32),
            rng.uniform(10, 60, 32), rng.uniform(10, 60, 32),
        ], -1), jnp.float32)
    gt = jnp.asarray(np.sort(
        rng.uniform(0, 300, (32, 2, 2)), axis=1
    ).transpose(0, 2, 1).reshape(32, 4), jnp.float32)
    # columns: y1 x1 y2 x2 with y2>y1, x2>x1
    gt = jnp.concatenate([gt[:, [0]], gt[:, [2]],
                          gt[:, [1]], gt[:, [3]]], axis=1)
    t = D.regression_targets(anchors, gt)
    back = decode_boxes(t, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt),
                               rtol=1e-4, atol=1e-3)


def test_focal_loss_semantics():
    logits_good = jnp.asarray([[8.0, -8.0], [-8.0, 8.0]])
    logits_bad = -logits_good
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    w = jnp.ones((2,))
    good = float(D.focal_loss(logits_good, targets, w))
    bad = float(D.focal_loss(logits_bad, targets, w))
    assert good < 1e-2 < bad
    # ignored anchors contribute nothing
    zero = float(D.focal_loss(logits_bad, targets, jnp.zeros((2,))))
    assert zero == 0.0


def test_detection_loss_prefers_correct_predictions():
    """Loss evaluated on logits/regressions that exactly describe the gt
    must be far below loss on shuffled garbage."""
    cfg = AnchorConfig(min_level=3, max_level=4)
    anchors = jnp.asarray(generate_anchors(cfg, 64, 64))
    n = anchors.shape[0]
    gt = jnp.asarray([[[10.0, 10.0, 40.0, 40.0]]])
    cls_ids = jnp.asarray([[0]], jnp.int32)
    valid = jnp.asarray([[True]])

    matched, state = D.match_anchors(anchors, gt[0], valid[0])
    t = D.regression_targets(anchors, gt[0][matched])
    pos = (state == 1)[:, None]
    good_logits = jnp.where(
        pos, 8.0, -8.0
    ) * jnp.ones((1, n, 1))
    good_regs = (t * pos)[None]
    bad_logits = jnp.full((1, n, 1), 8.0)
    bad_regs = jnp.ones((1, n, 4)) * 3.0

    lo = float(D.detection_loss(good_logits, good_regs, anchors, gt,
                                cls_ids, valid, num_classes=1))
    hi = float(D.detection_loss(bad_logits, bad_regs, anchors, gt,
                                cls_ids, valid, num_classes=1))
    assert lo < 0.1 * hi


def test_sharded_det_train_step_runs_and_descends():
    """One tiny EfficientDet on the ('data','model') mesh: three steps on
    a fixed batch must strictly decrease the loss."""
    cfg = E.EfficientDetConfig(
        backbone=dataclasses.replace(E.EFFICIENTDET_LITE0.backbone,
                                     depth_mult=0.1),
        fpn_channels=24,
        fpn_repeats=1,
        head_repeats=1,
        num_classes=4,
    )
    model = E.EfficientDet(config=cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state, tx = D.create_det_train_state(model, rng, (1, 64, 64, 3), 3e-4)

    mesh = M.make_mesh(8, model_parallel=2)
    step_fn, sstate = D.make_sharded_det_train_step(model, tx, state, mesh)

    img_rng = np.random.default_rng(1)
    imgs = jnp.asarray(
        img_rng.integers(0, 256, (8, 64, 64, 3)), jnp.uint8
    )
    gt = jnp.tile(jnp.asarray([[[8.0, 8.0, 40.0, 48.0],
                                [20.0, 30.0, 60.0, 62.0]]]), (8, 1, 1))
    cls_ids = jnp.tile(jnp.asarray([[0, 2]], jnp.int32), (8, 1))
    valid = jnp.tile(jnp.asarray([[True, True]]), (8, 1))

    losses = []
    for _ in range(3):
        sstate, loss = step_fn(sstate, imgs, gt, cls_ids, valid)
        losses.append(float(jax.device_get(loss)))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_class_head_focal_prior_bias_init():
    """create_det_train_state initializes the class head's prediction
    bias to the focal prior log(pi/(1-pi)), pi=0.01 (RetinaNet §4.1):
    every anchor starts near p=0.01 background instead of p=0.5, so the
    first-step loss is ~|anchors|*alpha*log(1/0.99) small instead of the
    ~35k blowup the r03 chip run opened with."""
    cfg = E.EfficientDetConfig(
        backbone=dataclasses.replace(E.EFFICIENTDET_LITE0.backbone,
                                     depth_mult=0.1),
        fpn_channels=24, fpn_repeats=1, head_repeats=1, num_classes=4,
    )
    model = E.EfficientDet(config=cfg, dtype=jnp.float32)
    state, _ = D.create_det_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), 3e-4
    )
    bias = state.params["class_net"]["predict_pw"]["bias"]
    prior = float(np.log(0.01 / 0.99))
    np.testing.assert_allclose(np.asarray(bias), prior, rtol=1e-6)
    # the box head must stay zero-init
    assert np.all(
        np.asarray(state.params["box_net"]["predict_pw"]["bias"]) == 0.0
    )


def test_det_train_state_schedule_and_clip():
    """total_steps/warmup_steps/clip_norm wire up warmup-cosine + global
    norm clipping: the step-0 update is exactly zero (warmup starts at
    LR 0), later updates are non-zero, and a huge gradient's update is
    bounded by the clipped Adam step size."""
    cfg = E.EfficientDetConfig(
        backbone=dataclasses.replace(E.EFFICIENTDET_LITE0.backbone,
                                     depth_mult=0.1),
        fpn_channels=24, fpn_repeats=1, head_repeats=1, num_classes=4,
    )
    model = E.EfficientDet(config=cfg, dtype=jnp.float32)
    lr = 1e-3
    state, tx = D.create_det_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), lr,
        total_steps=100, warmup_steps=10, clip_norm=10.0,
    )
    grads = jax.tree.map(jnp.ones_like, state.params)
    opt_state = tx.init(state.params)
    updates, opt_state = tx.update(grads, opt_state, state.params)
    flat = np.concatenate([
        np.asarray(u).ravel() for u in jax.tree.leaves(updates)
    ])
    assert np.all(flat == 0.0), "warmup step 0 must be LR=0"
    # advance a few steps: updates become non-zero and Adam-bounded
    for _ in range(5):
        updates, opt_state = tx.update(grads, opt_state, state.params)
    flat = np.concatenate([
        np.asarray(u).ravel() for u in jax.tree.leaves(updates)
    ])
    assert np.any(flat != 0.0)
    assert np.max(np.abs(flat)) <= lr * 1.01  # adam step bounded by LR
