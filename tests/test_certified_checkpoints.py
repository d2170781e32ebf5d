"""Structural validation of the COMMITTED synthetic-certified checkpoints.

The serving defaults load these npz files (`models/weights.
maybe_load_certified`) whenever the user gives no --checkpoint-dir — the
reference makes its checkpoint download mandatory (README.md:13-26), so
the committed files are product surface, not test fixtures. These tests
catch the failure mode certification can't: a committed file whose param
tree silently drifted from the architectures the registry/pipeline build
(e.g. a config change after the certify run). Shape checking uses
`jax.eval_shape` — no full-size init, so the suite stays cheap on the
1-core CPU runner.

Accuracy itself is certified on-chip (BENCHMARKS.md "Accuracy
(measured)"); here we only assert load-ability + tree congruence.
"""

import os

import jax
import numpy as np
import pytest

from human_body_proportion_estimation_tpu.models import weights as W


def _tree_shapes(tree) -> dict:
    out = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        out[name] = tuple(leaf.shape)
    return out


def _assert_congruent(loaded, arch_shapes: dict, what: str):
    got = _tree_shapes(loaded)
    missing = sorted(set(arch_shapes) - set(got))
    extra = sorted(set(got) - set(arch_shapes))
    assert not missing, f"{what}: checkpoint lacks params {missing[:5]}"
    assert not extra, f"{what}: checkpoint has stray params {extra[:5]}"
    bad = {k: (got[k], arch_shapes[k])
           for k in got if got[k] != arch_shapes[k]}
    assert not bad, f"{what}: shape drift {dict(list(bad.items())[:5])}"


def test_certified_topdown_checkpoint_matches_architectures():
    path = W.default_certified_checkpoint()
    if not os.path.exists(path):
        pytest.skip("committed top-down certified checkpoint absent")
    det_vars, pose_vars = W.load_compact_checkpoint(path)
    # all float leaves must come back f32 (params f32 at rest) and finite
    for leaf in jax.tree_util.tree_leaves((det_vars, pose_vars)):
        if np.issubdtype(leaf.dtype, np.floating):
            assert leaf.dtype == np.float32
            assert np.isfinite(leaf).all()

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE4,
        EfficientDet,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import HRNet

    det = EfficientDet(config=EFFICIENTDET_LITE4)
    det_shapes = jax.eval_shape(
        det.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 480, 640, 3), np.float32),
    )
    _assert_congruent(det_vars, _tree_shapes(det_shapes), "lite4 det")

    pose = HRNet()
    pose_shapes = jax.eval_shape(
        pose.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 384, 288, 3), np.float32),
    )
    _assert_congruent(pose_vars, _tree_shapes(pose_shapes), "w32 pose")


def test_certified_bottomup_checkpoint_matches_architecture():
    path = W.default_certified_bottomup_checkpoint()
    if not os.path.exists(path):
        pytest.skip("committed bottom-up certified checkpoint absent")
    det_vars, pose_vars = W.load_compact_checkpoint(path)
    assert not det_vars, "bottom-up checkpoint must be pose-slot-only"
    for leaf in jax.tree_util.tree_leaves(pose_vars):
        if np.issubdtype(leaf.dtype, np.floating):
            assert leaf.dtype == np.float32
            assert np.isfinite(leaf).all()

    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNet,
    )
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )

    h, w = BottomUpPipeline.INPUT_HW
    model = HigherHRNet()
    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, h, w, 3), np.float32),
    )
    _assert_congruent(pose_vars, _tree_shapes(shapes), "higherhrnet")
