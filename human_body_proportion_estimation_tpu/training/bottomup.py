"""Bottom-up (HigherHRNet) training: multi-person heatmap targets + the
associative-embedding grouping loss.

Completes the training story for the bottom-up pipeline
(pipeline/bottomup.py): the reference ships only pretrained weights and
has no training at all (SURVEY §5 checkpoint row); the top-down trainer
(training/trainer.py) covers HRNet's single-person heatmap MSE. This
module adds what HigherHRNet's train-time head needs (Newell et al.
NeurIPS'17 "Associative Embedding", Cheng et al. CVPR'20):

  * `multi_person_heatmap_targets` — per-joint gaussian maps max-combined
    over the person slots (fixed [B, P, K, 2] keypoints + validity mask,
    no data-dependent shapes);
  * `ae_loss` — pull each person's predicted tags toward their mean,
    push different persons' means apart (exp(-d^2/2) repulsion), entirely
    mask-based so padded person slots contribute zero;
  * `bottomup_train_step` — joint loss over both heads: MSE on the
    1/2-res "output_2" heatmaps, MSE on the 1/4-res "output_1" heatmap
    half, and the AE loss on the "output_1" tag half, one optimizer step
    under jit. Shards over a ('data','model') mesh with the same
    annotation-driven collectives as the top-down step.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from human_body_proportion_estimation_tpu.training.trainer import (
    PoseTrainState,
)


def multi_person_heatmap_targets(
    keypoints: jax.Array,   # [B, P, K, 2] (x, y) in target heatmap coords
    visible: jax.Array,     # [B, P, K] bool
    hm_h: int,
    hm_w: int,
    sigma: float = 2.0,
) -> jax.Array:
    """Gaussian targets [B, hm_h, hm_w, K]: max over person slots."""
    ys = jnp.arange(hm_h, dtype=jnp.float32)
    xs = jnp.arange(hm_w, dtype=jnp.float32)
    d2 = (
        (ys[None, None, None, :, None]
         - keypoints[..., 1][..., None, None]) ** 2
        + (xs[None, None, None, None, :]
           - keypoints[..., 0][..., None, None]) ** 2
    )  # [B, P, K, H, W]
    g = jnp.exp(-d2 / (2.0 * sigma**2)) * visible[..., None, None]
    g = jnp.max(g, axis=1)                    # combine persons
    return jnp.moveaxis(g, 1, -1)             # [B, H, W, K]


def ae_loss(
    tags: jax.Array,        # [B, H, W, K] predicted tag maps
    keypoints: jax.Array,   # [B, P, K, 2] (x, y) int-castable, tag coords
    visible: jax.Array,     # [B, P, K] bool
) -> jax.Array:
    """Grouping loss (Newell'17 eq. 1-3, the 'exp' push variant used by
    HigherHRNet). Returns a scalar: mean pull + mean push per image."""
    b, p, k, _ = keypoints.shape
    h, w = tags.shape[1:3]
    xi = jnp.clip(keypoints[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(keypoints[..., 1].astype(jnp.int32), 0, h - 1)
    kk = jnp.broadcast_to(jnp.arange(k)[None, None, :], (b, p, k))
    bb = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, p, k))
    t = tags[bb, yi, xi, kk]                  # [B, P, K]

    vis = visible.astype(jnp.float32)
    n_joints = jnp.sum(vis, axis=-1)                          # [B, P]
    person_valid = n_joints > 0
    mean = jnp.sum(t * vis, axis=-1) / jnp.maximum(n_joints, 1.0)  # [B, P]

    # pull: joints toward their person's reference tag
    pull = jnp.sum(((t - mean[..., None]) ** 2) * vis, axis=(-1, -2))
    pull = pull / jnp.maximum(jnp.sum(vis, axis=(-1, -2)), 1.0)   # [B]

    # push: distinct valid persons' means repel
    pv = person_valid.astype(jnp.float32)
    pair = pv[:, :, None] * pv[:, None, :]
    pair = pair * (1.0 - jnp.eye(p)[None])
    d2 = (mean[:, :, None] - mean[:, None, :]) ** 2
    push = jnp.sum(jnp.exp(-d2 / 2.0) * pair, axis=(-1, -2))
    n_pairs = jnp.maximum(jnp.sum(pair, axis=(-1, -2)), 1.0)
    push = push / n_pairs                                          # [B]

    return jnp.mean(pull + 0.5 * push)


def bottomup_train_step(
    model,                  # HigherHRNet
    tx: optax.GradientTransformation,
    state: PoseTrainState,
    images: jax.Array,      # [B, H, W, 3] float in [0,1]
    keypoints: jax.Array,   # [B, P, K, 2] (x, y) in IMAGE coords
    visible: jax.Array,     # [B, P, K] bool
    ae_weight: float = 1e-3,
    fg_weight: float = 0.0,
) -> tuple[PoseTrainState, jax.Array]:
    """One jointly-supervised optimizer step (both heads + AE).

    `fg_weight`: peak-pixel MSE up-weight `1 + fg_weight * target` — the
    same amplitude fix the top-down trainer uses (training/trainer.py):
    plain MSE over the ~99% background pixels converges with peak heights
    well under the serving gates (`PoseConfig.keypoint_thresholds`, up to
    0.46, and the AE decode's `score_threshold`), so correct keypoints get
    dropped as "Part not visible"."""
    k = keypoints.shape[2]

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        out1, out2 = out["output_1"], out["output_2"]
        loss = jnp.float32(0.0)
        for hm, scale in ((out1[..., :k], 0.25), (out2, 0.5)):
            tgt = multi_person_heatmap_targets(
                keypoints * scale, visible, hm.shape[1], hm.shape[2]
            )
            w = 1.0 + fg_weight * tgt
            loss = loss + jnp.mean(
                w * (hm.astype(jnp.float32) - tgt) ** 2
            )
        loss = loss + ae_weight * ae_loss(
            out1[..., k:].astype(jnp.float32), keypoints * 0.25, visible
        )
        return loss, mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        PoseTrainState(state.step + 1, new_params, new_stats, new_opt),
        loss,
    )


def make_sharded_bottomup_step(model, tx, state: PoseTrainState, mesh):
    """jit the bottom-up step over a ('data','model') mesh, same
    annotation-driven sharding as the top-down trainer."""
    from human_body_proportion_estimation_tpu.parallel import (
        mesh as mesh_lib,
    )

    state_shardings = PoseTrainState(
        step=mesh_lib.replicated(mesh),
        params=mesh_lib.param_shardings(state.params, mesh),
        batch_stats=mesh_lib.param_shardings(state.batch_stats, mesh),
        opt_state=mesh_lib.param_shardings(state.opt_state, mesh),
    )
    sharded_state = jax.tree.map(
        jax.device_put, state, state_shardings,
        is_leaf=lambda x: x is None,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    # leading-dim-only spec: inputs have mixed ranks (images 4, kp 4,
    # visible 3)
    data = NamedSharding(mesh, P("data"))
    step_fn = jax.jit(
        functools.partial(bottomup_train_step, model, tx),
        in_shardings=(state_shardings, data, data, data),
        out_shardings=(state_shardings, mesh_lib.replicated(mesh)),
    )
    return step_fn, sharded_state
