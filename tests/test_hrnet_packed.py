"""Packed (space-to-depth) HRNet == canonical HRNet, same variable tree.

The packed high-res branch (models/hrnet.py `packed_branch0`,
ops/s2d.py) is a serving-path reparametrization for MXU utilization; it
must be numerically equivalent to the canonical graph on the SAME
variables, so any imported checkpoint (tests/test_torch_forward_
equivalence.py proves those match real torch HRNet) transfers verbatim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_body_proportion_estimation_tpu.models.hrnet import HRNet, HRNET_W32


def _models(dtype):
    canon = HRNet(config=HRNET_W32, dtype=dtype)
    packed = HRNet(config=HRNET_W32, dtype=dtype, packed_branch0=True)
    return canon, packed


def test_variable_trees_identical():
    x = jnp.zeros((1, 128, 96, 3), jnp.float32)
    canon, packed = _models(jnp.float32)
    vc = canon.init(jax.random.PRNGKey(0), x)
    vp = packed.init(jax.random.PRNGKey(0), x)
    shapes = lambda v: jax.tree.map(lambda a: a.shape, v)
    assert shapes(vc) == shapes(vp)


def test_forward_equivalence_f32():
    # full W32 channel structure on a reduced input (CPU-affordable)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 96, 3))
    canon, packed = _models(jnp.float32)
    v = canon.init(jax.random.PRNGKey(0), x)
    ref = canon.apply(v, x)
    got = packed.apply(v, x)
    assert got.shape == ref.shape == (2, 32, 24, 17)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-2
    )


def test_forward_equivalence_bf16():
    """Packing must not add noise beyond bf16 itself: packed-bf16 and
    canonical-bf16 should sit at a comparable distance from the f32
    truth (random-init activations reach O(100), so absolute bf16 noise
    is large for both — the COMPARISON is the invariant)."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 96, 3))
    canon32, _ = _models(jnp.float32)
    canon16, packed16 = _models(jnp.bfloat16)
    v = canon32.init(jax.random.PRNGKey(0), x)
    truth = np.asarray(canon32.apply(v, x), np.float32)
    err_canon = np.abs(np.asarray(canon16.apply(v, x), np.float32) - truth)
    err_packed = np.abs(np.asarray(packed16.apply(v, x), np.float32) - truth)
    scale = np.abs(truth).max()
    assert err_packed.max() / scale < 0.25
    assert err_packed.mean() <= 3.0 * err_canon.mean() + 1e-3 * scale


def test_packed_refuses_train():
    x = jnp.zeros((1, 128, 96, 3), jnp.float32)
    canon, packed = _models(jnp.float32)
    v = canon.init(jax.random.PRNGKey(0), x)
    # train=True silently falls back to the canonical graph (BN running
    # stats are a serving-path assumption)
    out = packed.apply(v, x, train=True, mutable=["batch_stats"])
    assert out[0].shape == (1, 32, 24, 17)
