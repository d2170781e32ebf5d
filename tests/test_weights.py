"""Weight converters: exact export/import round trip + orbax checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.models.hrnet import HRNET_W32, HRNet
from human_body_proportion_estimation_tpu.models import weights as W


@pytest.fixture(scope="module")
def hrnet_vars():
    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    return model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 32, 3), jnp.float32)
    )


def test_torch_roundtrip_exact(hrnet_vars):
    # export A -> torch dict -> import into a differently-seeded tree B:
    # B must become exactly A (every leaf covered by the mapping)
    sd = W.export_torch_hrnet(hrnet_vars)
    assert "conv1.weight" in sd and "final_layer.weight" in sd
    assert sd["conv1.weight"].shape == (64, 3, 3, 3)  # OIHW

    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    other = model.init(
        jax.random.PRNGKey(99), jnp.zeros((1, 64, 32, 3), jnp.float32)
    )
    restored = W.import_torch_hrnet(sd, other, strict=True)

    flat_a = jax.tree_util.tree_leaves_with_path(hrnet_vars)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    mismatched = []
    for path, leaf in flat_a:
        got = flat_b[path]
        if not np.array_equal(np.asarray(leaf), np.asarray(got)):
            mismatched.append(jax.tree_util.keystr(path))
    assert not mismatched, f"unmapped/mismatched leaves: {mismatched[:10]}"


def test_import_forward_equivalence(hrnet_vars):
    # imported weights must produce the SAME forward outputs
    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    sd = W.export_torch_hrnet(hrnet_vars)
    other = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 32, 3), jnp.float32)
    )
    restored = W.import_torch_hrnet(sd, other)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 32, 3))
    a = model.apply(hrnet_vars, x)
    b = model.apply(jax.tree.map(jnp.asarray, restored), x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_import_skips_missing_keys_nonstrict(hrnet_vars):
    sd = W.export_torch_hrnet(hrnet_vars)
    # drop the stage-4 fuse rows a real official checkpoint wouldn't have
    partial = {k: v for k, v in sd.items() if "stage4.2.fuse_layers.1" not in k
               and "stage4.2.fuse_layers.2" not in k
               and "stage4.2.fuse_layers.3" not in k}
    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    other = model.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 64, 32, 3), jnp.float32)
    )
    restored = W.import_torch_hrnet(partial, other)  # must not raise
    # head still mapped
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["kernel"]),
        np.asarray(hrnet_vars["params"]["head"]["kernel"]),
    )
    with pytest.raises(KeyError):
        W.import_torch_hrnet(partial, other, strict=True)


def test_orbax_checkpoint_roundtrip(tmp_path, hrnet_vars):
    det = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    W.save_pipeline_checkpoint(str(tmp_path / "ckpt"), det, hrnet_vars)
    det2, pose2 = W.load_pipeline_checkpoint(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(
        np.asarray(det2["params"]["w"]), np.asarray(det["params"]["w"])
    )
    a = jax.tree_util.tree_leaves(hrnet_vars)
    b = jax.tree_util.tree_leaves(pose2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_compact_checkpoint_roundtrip(tmp_path, hrnet_vars):
    """Repo-committable single-file f16 checkpoint: same tree structure
    back, float leaves within f16 quantization (~2^-11 relative), int
    leaves (batch_stats counters etc.) exact."""
    det = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3) * 0.01},
        "batch_stats": {"count": np.array([3], np.int64)},
    }
    p = str(tmp_path / "ck.npz")
    W.save_compact_checkpoint(p, det, hrnet_vars)
    det2, pose2 = W.load_compact_checkpoint(p)
    np.testing.assert_allclose(
        np.asarray(det2["params"]["w"]),
        np.asarray(det["params"]["w"]), rtol=1e-3,
    )
    assert det2["params"]["w"].dtype == np.float32
    np.testing.assert_array_equal(det2["batch_stats"]["count"],
                                  det["batch_stats"]["count"])
    flat_a = jax.tree_util.tree_flatten_with_path(hrnet_vars)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(pose2)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, x), (kb, y) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=1e-6)
