"""Pallas head-score epilogue kernel vs the plain XLA reference, plus the
person-slots selection it feeds (ops/pallas_kernels.head_score_epilogue,
models/efficientdet.person_slots)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models import efficientdet as edet
from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
    head_score_epilogue,
)


@pytest.mark.parametrize("hw,f,a,c", [((12, 16), 64, 9, 90),
                                      ((7, 5), 32, 3, 11)])
def test_head_score_epilogue_matches_reference(hw, f, a, c):
    rng = np.random.default_rng(0)
    h, w = hw
    z = jnp.asarray(rng.normal(0, 1, (2, h, w, f)), jnp.float32)
    kernel = jnp.asarray(rng.normal(0, 0.1, (1, 1, f, a * c)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (a * c,)), jnp.float32)

    best, person = head_score_epilogue(
        z, kernel, bias, a, c, person_class0=0, tile_m=128, interpret=True
    )

    # reference with the SAME bf16-input/f32-accumulate precision
    y = jnp.einsum(
        "bhwf,fo->bhwo",
        z.astype(jnp.bfloat16).astype(jnp.float32),
        kernel.reshape(f, a * c).astype(jnp.bfloat16).astype(jnp.float32),
    ) + bias
    y = y.reshape(2, h, w, a, c)
    np.testing.assert_allclose(
        np.asarray(best), np.asarray(jnp.max(y, -1)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(person), np.asarray(y[..., 0]), rtol=1e-4, atol=1e-4
    )


def test_person_slots_matches_reference_postprocess():
    """person_slots (person-only NMS on kernel outputs) == the canonical
    postprocess -> select_persons chain for the person class, on logits
    whose person candidates are decisively separated."""
    from human_body_proportion_estimation_tpu.pipeline.full import (
        select_persons,
    )

    cfg = edet.EFFICIENTDET_LITE0
    hw = (128, 128)
    n = edet.generate_anchors(cfg.anchors, *hw).shape[0]
    rng = np.random.default_rng(1)
    # background-ish logits everywhere, a handful of decisive persons
    cls = rng.normal(-6.0, 0.5, (n, cfg.num_classes)).astype(np.float32)
    person_anchors = rng.choice(n, 12, replace=False)
    cls[person_anchors, 0] = rng.uniform(2.0, 5.0, 12)
    box = rng.normal(0, 0.2, (n, 4)).astype(np.float32)

    cls_j, box_j = jnp.asarray(cls), jnp.asarray(box)
    thres = jnp.float32(0.5)

    boxes_a, scores_a, classes_a, valid_a = edet.postprocess(
        cls_j, box_j, hw, cfg, top_k=128
    )
    ref = select_persons(boxes_a, scores_a, classes_a, valid_a, thres, 1, 3)

    got = edet.person_slots(
        jnp.max(cls_j, -1), cls_j[:, 0], box_j, hw, cfg, thres, top_k=128
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r).astype(np.float32),
            np.asarray(g).astype(np.float32), rtol=1e-5, atol=1e-5,
        )


def test_score_kernel_model_tree_is_canonical():
    """EfficientDet(score_kernel=True) must expose the SAME variable tree
    as the canonical model, so checkpoints/importers are unaffected."""
    m0 = edet.EfficientDet(config=edet.EFFICIENTDET_LITE0)
    m1 = edet.EfficientDet(config=edet.EFFICIENTDET_LITE0, score_kernel=True)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), img)
    v1 = m1.init(jax.random.PRNGKey(0), img)
    t0 = jax.tree.structure(v0)
    t1 = jax.tree.structure(v1)
    assert t0 == t1
    s0 = jax.tree.map(lambda x: x.shape, v0)
    s1 = jax.tree.map(lambda x: x.shape, v1)
    assert s0 == s1


def test_head_score_epilogue_sharded_matches_unsharded():
    """mesh= wraps the kernel in shard_map over 'data': per-shard results
    must equal the unsharded kernel's (weights replicated, batch split)."""
    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    f, a, c = 32, 3, 11
    z = jnp.asarray(rng.normal(0, 1, (8, 6, 4, f)), jnp.float32)
    kernel = jnp.asarray(rng.normal(0, 0.1, (1, 1, f, a * c)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (a * c,)), jnp.float32)

    ref = head_score_epilogue(z, kernel, bias, a, c, tile_m=128,
                              interpret=True)
    got = head_score_epilogue(z, kernel, bias, a, c, tile_m=128,
                              interpret=True, mesh=mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=1e-5, atol=1e-5)
    # executes as a genuinely sharded program: output spans all devices
    assert len(got[0].sharding.device_set) == 8


def test_decode_heatmaps_pallas_sharded_matches_unsharded():
    from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
        decode_heatmaps_pallas,
    )
    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    hm = jnp.asarray(rng.normal(0, 1, (16, 17, 24, 18)), jnp.float32)
    ref_kp, ref_sc = decode_heatmaps_pallas(hm, interpret=True)
    got_kp, got_sc = decode_heatmaps_pallas(hm, interpret=True, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(ref_kp), np.asarray(got_kp))
    np.testing.assert_array_equal(np.asarray(ref_sc), np.asarray(got_sc))
    assert len(got_kp.sharding.device_set) == 8


def test_efficientdet_score_kernel_under_mesh_matches_single():
    """Model-level integration: EfficientDet(score_kernel=True,
    score_kernel_mesh=mesh) — the dp-sharded serving configuration —
    produces the same (best, person, box) outputs as the unsharded
    kernel model with identical params (interpret mode on the CPU mesh)."""
    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    cfg = edet.EFFICIENTDET_LITE0
    kwargs = dict(config=cfg, score_kernel=True, score_kernel_interpret=True)
    single = edet.EfficientDet(**kwargs)
    sharded = edet.EfficientDet(**kwargs, score_kernel_mesh=mesh)

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(
        rng.integers(0, 256, (8, 128, 128, 3)), jnp.uint8
    )
    variables = single.init(jax.random.PRNGKey(0), imgs[:1])
    # jit both sides so fusion-order bf16 noise doesn't enter the
    # comparison — the only intended difference is the shard_map wrap
    ref = jax.jit(
        lambda v, x: single.apply(v, x, prescored=True)
    )(variables, imgs)
    got = jax.jit(
        lambda v, x: sharded.apply(v, x, prescored=True)
    )(variables, imgs)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=5e-3, atol=5e-3)
