"""EfficientDet-Lite: anchors, decode, head shapes, postprocess contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.models import anchors as A
from human_body_proportion_estimation_tpu.models.efficientdet import (
    EFFICIENTDET_LITE0,
    EfficientDet,
    postprocess,
)


def test_anchor_counts_and_geometry():
    cfg = A.AnchorConfig()
    anc = A.generate_anchors(cfg, 480, 640)
    expect = sum(
        -(-480 // 2 ** l) * -(-640 // 2 ** l) * 9 for l in range(3, 8)
    )
    assert anc.shape == (expect, 4)
    # first anchor: level 3, cell (0,0), scale 0, ratio 1.0
    assert np.allclose(anc[0, :2], [4.0, 4.0])  # center at stride/2
    assert np.allclose(anc[0, 2:], [3 * 8, 3 * 8])  # anchor_scale*stride
    # aspect 2.0 anchor is wider than tall
    assert anc[1, 3] > anc[1, 2]


def test_decode_identity_and_shift():
    anc = jnp.asarray([[100.0, 200.0, 50.0, 30.0]])
    # zero regression -> the anchor box itself
    out = np.asarray(A.decode_boxes(jnp.zeros((1, 4)), anc))[0]
    np.testing.assert_allclose(out, [75, 185, 125, 215])
    # ty=1 shifts center down by anchor height
    out2 = np.asarray(
        A.decode_boxes(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), anc)
    )[0]
    np.testing.assert_allclose(out2, [125, 185, 175, 215])


@pytest.fixture(scope="module")
def lite0_outputs():
    model = EfficientDet(config=EFFICIENTDET_LITE0, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    cls, box = model.apply(params, x)
    return cls, box


def test_head_output_shapes(lite0_outputs):
    cls, box = lite0_outputs
    n_anchors = sum(
        -(-128 // 2 ** l) * -(-128 // 2 ** l) * 9 for l in range(3, 8)
    )
    assert cls.shape == (1, n_anchors, 90)
    assert box.shape == (1, n_anchors, 4)


def test_postprocess_contract(lite0_outputs):
    cls, box = lite0_outputs
    cfg = EFFICIENTDET_LITE0
    boxes, scores, classes, valid = postprocess(
        cls[0], box[0], (128, 128), cfg, top_k=128
    )
    assert boxes.shape == (100, 4)
    assert scores.shape == (100,)
    v = np.asarray(valid)
    b = np.asarray(boxes)
    c = np.asarray(classes)
    # yxyx within image, classes 1-based where valid
    assert np.all(b[:, 0] <= b[:, 2] + 1e-5) and np.all(b >= 0)
    assert np.all(b[:, [0, 2]] <= 128) and np.all(b[:, [1, 3]] <= 128)
    assert np.all(c[v] >= 1.0)
    # scores sorted descending over valid slots
    sv = np.asarray(scores)[v]
    assert np.all(np.diff(sv) <= 1e-6)


def test_head_weights_shared_across_levels(lite0_outputs):
    # shared conv params: one dw/pw per repeat, not per level
    model = EfficientDet(config=EFFICIENTDET_LITE0, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x)
    )
    cls_net = params["params"]["class_net"]
    assert "dw0" in cls_net and "dw0_l1" not in cls_net
    # per-level BN exists for all 5 levels
    for li in range(5):
        assert f"bn0_l{li}" in cls_net
