"""Training loop: data pipeline -> sharded train step -> checkpoints.

Glue for pose fine-tuning: pulls augmented batches from `training/data`,
builds heatmap targets, drives the dp x tp sharded `train_step`, logs
losses, and checkpoints via orbax — the train-side lifecycle the
inference-only reference never had.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import numpy as np

from human_body_proportion_estimation_tpu.training import data as data_lib
from human_body_proportion_estimation_tpu.training import trainer as trainer_lib
from human_body_proportion_estimation_tpu.utils.logging import get_logger

log = get_logger("train")


def train_pose(
    model,
    samples: Sequence[data_lib.PoseSample],
    steps: int = 1000,
    batch_size: int = 16,
    learning_rate: float = 1e-3,
    crop_hw=(384, 288),
    mesh=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 500,
    log_every: int = 50,
    seed: int = 0,
    augment: bool = True,
):
    """Fine-tune a pose model; returns the final (host) train state."""
    import jax.numpy as jnp

    h, w = crop_hw
    state, tx = trainer_lib.create_train_state(
        model, jax.random.PRNGKey(seed), (1, h, w, 3), learning_rate
    )
    if mesh is not None:
        step_fn, state = trainer_lib.make_sharded_train_step(
            model, tx, state, mesh
        )
    else:
        import functools

        step_fn = jax.jit(functools.partial(trainer_lib.train_step, model, tx))

    hm_h, hm_w = h // 4, w // 4
    batches = data_lib.batch_iterator(
        samples, batch_size, crop_hw, augment=augment, seed=seed
    )
    losses = []
    t0 = time.perf_counter()
    for step in range(1, steps + 1):
        images, kp_hm, visible = next(batches)
        targets = trainer_lib.heatmap_targets(
            jnp.asarray(kp_hm), jnp.asarray(visible), hm_h, hm_w
        )
        state, loss = step_fn(state, jnp.asarray(images), targets)
        losses.append(float(loss))
        if step % log_every == 0:
            rate = log_every * batch_size / (time.perf_counter() - t0)
            log.info("train_step", step=step,
                     loss=float(np.mean(losses[-log_every:])),
                     imgs_per_sec=round(rate, 2))
            t0 = time.perf_counter()
        if checkpoint_dir and step % checkpoint_every == 0:
            _save(checkpoint_dir, state, step)
    if checkpoint_dir:
        _save(checkpoint_dir, state, steps)
    return state, losses


def _save(directory: str, state, step: int):
    import os

    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    host_state = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats,
         "step": state.step}
    )
    ckpt.save(
        os.path.join(os.path.abspath(directory), f"step_{step}"),
        host_state, force=True,
    )
    log.info("checkpoint_saved", step=step, directory=directory)
