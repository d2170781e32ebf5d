"""Pose-model fine-tuning: heatmap-MSE training step, sharded dp x tp.

The reference is inference-only (weights arrive pre-trained via Google
Drive, README :13-26); this framework adds the training capability its
model zoo implies: top-down pose training with per-keypoint gaussian
heatmap targets and MSE loss (the standard HRNet recipe), expressed as a
pure jitted step over a ('data', 'model') mesh — batch sharded over data,
large conv channels sharded over model, gradients all-reduced by XLA from
the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from human_body_proportion_estimation_tpu.parallel import mesh as mesh_lib


class PoseTrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int],
    learning_rate: float = 1e-3,
    total_steps: int | None = None,
    warmup_steps: int = 0,
) -> tuple[PoseTrainState, optax.GradientTransformation]:
    """`total_steps` switches the constant Adam LR to linear-warmup +
    cosine-decay over the run — the standard HRNet fine-tune schedule
    shape; the decayed tail is what lets the heatmap head settle to
    sub-bin peak placement instead of orbiting at a constant LR."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    if total_steps is not None:
        tx = optax.adam(optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=0.03 * learning_rate,
        ))
    else:
        tx = optax.adam(learning_rate)
    params = variables["params"]
    return (
        PoseTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        ),
        tx,
    )


def heatmap_targets(
    keypoints: jax.Array,   # [B, K, 2] (x, y) in heatmap coords
    visible: jax.Array,     # [B, K] bool
    hm_h: int,
    hm_w: int,
    sigma: float = 2.0,
) -> jax.Array:
    """Gaussian target heatmaps [B, hm_h, hm_w, K] (NHWC like the model)."""
    ys = jnp.arange(hm_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(hm_w, dtype=jnp.float32)[None, :]
    d2 = (
        (ys[None, None] - keypoints[..., 1][..., None, None]) ** 2
        + (xs[None, None] - keypoints[..., 0][..., None, None]) ** 2
    )  # [B, K, H, W]
    g = jnp.exp(-d2 / (2.0 * sigma**2))
    g = g * visible[..., None, None]
    return jnp.moveaxis(g, 1, -1)


def train_step(
    model,
    tx: optax.GradientTransformation,
    state: PoseTrainState,
    images: jax.Array,    # [B, H, W, 3] float in [0,1]
    targets: jax.Array,   # [B, H/4, W/4, K]
    target_weight: jax.Array | None = None,  # [B, K] visibility weights
    fg_weight: float = 0.0,
) -> tuple[PoseTrainState, jax.Array]:
    """One optimizer step; pure function of (state, batch).

    `fg_weight` up-weights the Gaussian-peak pixels in the MSE by
    ``1 + fg_weight * target``: with plain MSE the ~17x96x72 background
    pixels dominate the gradient and the head settles on wide,
    low-amplitude peaks (measured p50 max-score 0.12-0.29) — far below
    the reference's per-keypoint serving gates (up to 0.46,
    `person_det_pose_edet4_trtserver.py:162-163`). Peak-weighted MSE is
    the standard heatmap-regression fix and costs one fused multiply.
    """

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        err = (out - targets) ** 2
        if fg_weight:
            err = err * (1.0 + fg_weight * targets)
        if target_weight is not None:
            err = err * target_weight[:, None, None, :]
        return jnp.mean(err), mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        PoseTrainState(state.step + 1, new_params, new_stats, new_opt),
        loss,
    )


def make_sharded_train_step(model, tx, state: PoseTrainState, mesh):
    """jit the train step over a ('data','model') mesh.

    Returns (sharded_step, sharded_state): state resharded per the TP rule,
    batch inputs sharded over 'data'. XLA derives the gradient all-reduce
    over 'data' and the channel all-gathers over 'model' from these
    annotations alone — no hand-written collectives.
    """
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
    data_sharding = mesh_lib.batch_sharding(mesh)

    step_fn = jax.jit(
        functools.partial(train_step, model, tx),
        in_shardings=(state_shardings, data_sharding, data_sharding),
        out_shardings=(state_shardings, mesh_lib.replicated(mesh)),
    )
    return step_fn, sharded_state
