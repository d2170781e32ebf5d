"""Detector fine-tuning: anchor matching + focal/Huber losses, dp x tp.

The reference is inference-only — its EfficientDet-Lite4 arrives
pre-trained from the automl release (README :13-26, `models/conv.py:15-18`)
and can never be adapted in-repo. This module completes the training story
across the model zoo (pose: `trainer.py`, bottom-up AE: `bottomup.py`):
RetinaNet/EfficientDet-style detection training for the EfficientDet
family, expressed TPU-first — fixed-shape anchor matching (masks, no
boolean indexing), one pure jitted step over a ('data', 'model') mesh
with XLA-derived gradient collectives.

Recipe (standard EfficientDet, arxiv 1911.09070 §4 / RetinaNet
assignment): anchors with IoU >= 0.5 against a ground-truth box are
positive for that box, IoU < 0.4 negative (background), in-between
ignored; each ground truth additionally force-claims its best anchor so
no object goes unsupervised. Classification is sigmoid focal loss
(alpha 0.25, gamma 1.5) normalized by positive count; box regression is
Huber on the (ty, tx, th, tw) parameterization that `anchors.decode_boxes`
inverts at inference.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from human_body_proportion_estimation_tpu.models.anchors import (
    generate_anchors,
)
from human_body_proportion_estimation_tpu.ops.boxes import box_iou
from human_body_proportion_estimation_tpu.parallel import mesh as mesh_lib


class DetTrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_det_train_state(
    model,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int],
    learning_rate: float = 1e-3,
    total_steps: int | None = None,
    warmup_steps: int = 0,
    clip_norm: float = 0.0,
) -> tuple[DetTrainState, optax.GradientTransformation]:
    """Init params + optimizer for detector training from scratch.

    The class head's prediction bias is initialized to the focal prior
    log(pi/(1-pi)), pi=0.01 (RetinaNet arxiv 1708.02002 §4.1 / automl
    efficientdet): with a zero bias every one of the ~50k anchors starts
    at p=0.5 and the first epochs are spent suppressing background (the
    r03 chip run opened at loss 35090 and never recovered detection
    quality); with the prior, background is near-converged at init and
    capacity goes to the objects.

    `total_steps` switches the constant Adam LR to linear-warmup +
    cosine-decay over the run (`warmup_steps` long); `clip_norm` > 0 adds
    global-norm gradient clipping.
    """
    variables = model.init(rng, jnp.zeros(input_shape, jnp.uint8))
    params = variables["params"]
    head = params.get("class_net", {}).get("predict_pw")
    if head is not None and "bias" in head:
        prior = float(jnp.log(jnp.asarray(0.01 / 0.99)))
        head["bias"] = jnp.full_like(head["bias"], prior)
    if total_steps is not None:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=0.03 * learning_rate,
        )
        tx = optax.adam(schedule)
    else:
        tx = optax.adam(learning_rate)
    if clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return (
        DetTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        ),
        tx,
    )


def _cycxhw_to_yxyx(a: jax.Array) -> jax.Array:
    cy, cx, h, w = jnp.split(a, 4, axis=-1)
    return jnp.concatenate(
        [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1
    )


def match_anchors(
    anchors_cycxhw: jax.Array,  # [N, 4] pixel anchors (generate_anchors)
    gt_boxes_yxyx: jax.Array,   # [G, 4] pixel ground truth (padded)
    gt_valid: jax.Array,        # [G] bool — padding mask
    pos_iou: float = 0.5,
    neg_iou: float = 0.4,
) -> tuple[jax.Array, jax.Array]:
    """Fixed-shape RetinaNet assignment for ONE image.

    Returns (matched_gt [N] i32 — index into the G slots, meaningful only
    where state != 0 —, state [N] i32: 1 positive, 0 negative/background,
    -1 ignored). Padded ground-truth slots (gt_valid False) never match.
    """
    iou = box_iou(_cycxhw_to_yxyx(anchors_cycxhw), gt_boxes_yxyx)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)  # [N, G]

    best_gt = jnp.argmax(iou, axis=1).astype(jnp.int32)       # [N]
    best_iou = jnp.max(iou, axis=1)                           # [N]
    state = jnp.where(
        best_iou >= pos_iou,
        1,
        jnp.where(best_iou < neg_iou, 0, -1),
    ).astype(jnp.int32)

    # force-match: every valid gt claims its best anchor (argmax over N),
    # so small/odd-aspect objects below pos_iou still get a positive.
    # one [N, G] comparison instead of a scatter — fixed shapes, fuses.
    gt_best_anchor = jnp.argmax(iou, axis=0)                  # [G]
    n = anchors_cycxhw.shape[0]
    hit = (
        jnp.arange(n)[:, None] == gt_best_anchor[None, :]
    ) & gt_valid[None, :]                                     # [N, G]
    forced = jnp.any(hit, axis=1)
    forced_gt = jnp.argmax(hit, axis=1).astype(jnp.int32)
    state = jnp.where(forced, 1, state)
    matched_gt = jnp.where(forced, forced_gt, best_gt)
    return matched_gt, state


def regression_targets(
    anchors_cycxhw: jax.Array,  # [N, 4]
    gt_boxes_yxyx: jax.Array,   # [N, 4] matched gt per anchor
) -> jax.Array:
    """Inverse of `anchors.decode_boxes`: pixel yxyx gt -> (ty,tx,th,tw)."""
    cy_a, cx_a, h_a, w_a = jnp.split(anchors_cycxhw, 4, axis=-1)
    y1, x1, y2, x2 = jnp.split(gt_boxes_yxyx, 4, axis=-1)
    h_g = jnp.maximum(y2 - y1, 1e-6)
    w_g = jnp.maximum(x2 - x1, 1e-6)
    cy_g = (y1 + y2) / 2
    cx_g = (x1 + x2) / 2
    return jnp.concatenate(
        [
            (cy_g - cy_a) / h_a,
            (cx_g - cx_a) / w_a,
            jnp.log(h_g / h_a),
            jnp.log(w_g / w_a),
        ],
        axis=-1,
    )


def focal_loss(
    logits: jax.Array,    # [N, C]
    targets: jax.Array,   # [N, C] one-hot (all-zero for background)
    weight: jax.Array,    # [N] 1 for pos+neg anchors, 0 for ignored
    alpha: float = 0.25,
    gamma: float = 1.5,
) -> jax.Array:
    """Sigmoid focal loss summed over anchors and classes."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    a_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return jnp.sum(a_t * (1.0 - p_t) ** gamma * ce * weight[:, None])


def detection_loss(
    cls_logits: jax.Array,   # [B, N, C]
    box_regs: jax.Array,     # [B, N, 4]
    anchors: jax.Array,      # [N, 4] cycxhw
    gt_boxes: jax.Array,     # [B, G, 4] yxyx pixel, padded
    gt_classes: jax.Array,   # [B, G] i32 0-based class ids
    gt_valid: jax.Array,     # [B, G] bool
    num_classes: int,
    box_loss_weight: float = 50.0,  # automl hparams default
) -> jax.Array:
    """Batch focal + Huber detection loss, normalized by positive count."""

    def per_image(logits, regs, boxes, classes, valid):
        matched, state = match_anchors(anchors, boxes, valid)
        matched_boxes = boxes[matched]          # [N, 4]
        matched_cls = classes[matched]          # [N]

        one_hot = jax.nn.one_hot(matched_cls, num_classes) * (
            (state == 1)[:, None]
        )
        cls_l = focal_loss(logits, one_hot, (state != -1).astype(logits.dtype))

        t = regression_targets(anchors, matched_boxes)
        huber = optax.huber_loss(regs, t, delta=0.1).sum(-1)
        box_l = jnp.sum(huber * (state == 1))
        n_pos = jnp.maximum(jnp.sum(state == 1), 1)
        return (cls_l + box_loss_weight * box_l / 4.0) / n_pos

    return jnp.mean(
        jax.vmap(per_image)(cls_logits, box_regs, gt_boxes, gt_classes,
                            gt_valid)
    )


def train_step(
    model,
    tx: optax.GradientTransformation,
    state: DetTrainState,
    images: jax.Array,      # [B, H, W, 3] uint8
    gt_boxes: jax.Array,    # [B, G, 4] yxyx pixel
    gt_classes: jax.Array,  # [B, G] i32 0-based
    gt_valid: jax.Array,    # [B, G] bool
) -> tuple[DetTrainState, jax.Array]:
    """One optimizer step; pure function of (state, batch)."""
    cfg = model.config
    anchors = jnp.asarray(
        generate_anchors(cfg.anchors, images.shape[1], images.shape[2])
    )

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        cls_logits, box_regs = out
        loss = detection_loss(
            cls_logits.astype(jnp.float32), box_regs.astype(jnp.float32),
            anchors, gt_boxes, gt_classes, gt_valid, cfg.num_classes,
        )
        return loss, mutated.get("batch_stats", {})

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        DetTrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        ),
        loss,
    )


def make_sharded_det_train_step(model, tx, state: DetTrainState, mesh):
    """jit the detection train step over a ('data','model') mesh — same
    annotation-driven collective scheme as the pose trainer
    (`trainer.make_sharded_train_step`)."""
    state_shardings = DetTrainState(
        step=mesh_lib.replicated(mesh),
        params=mesh_lib.param_shardings(state.params, mesh),
        batch_stats=mesh_lib.param_shardings(state.batch_stats, mesh),
        opt_state=mesh_lib.param_shardings(state.opt_state, mesh),
    )
    sharded_state = jax.tree.map(
        jax.device_put, state, state_shardings,
        is_leaf=lambda x: x is None,
    )
    # rank-generic leading-axis batch sharding: images are rank 4 but the
    # gt tensors are rank 2/3, so a bare P('data') serves them all
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P("data"))
    step_fn = jax.jit(
        functools.partial(train_step, model, tx),
        in_shardings=(state_shardings, data, data, data, data),
        out_shardings=(state_shardings, mesh_lib.replicated(mesh)),
    )
    return step_fn, sharded_state
