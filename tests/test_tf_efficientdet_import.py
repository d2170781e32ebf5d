"""EfficientDet-Lite TF-checkpoint importer validation (VERDICT missing #1).

No network access in the sandbox, so no *real* automl checkpoint is
available; instead the importer is validated against a synthetically
constructed oracle:

  1. an INDEPENDENT TF re-implementation of EfficientDet-Lite (tf.nn ops,
     the automl fnode/resample node graph, automl variable names) is fed
     the same random tensors the importer maps into our flax model — the
     two forwards must agree (catches transposition, naming, topology and
     BN-epsilon bugs);
  2. the tensors round-trip exactly through export_tf_efficientdet;
  3. a real TF1-format checkpoint file is written/reloaded through
     load_tf_checkpoint_arrays (incl. ExponentialMovingAverage preference);
  4. the name map covers EVERY leaf of the flax variable tree (no silent
     random leaves after import).
"""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from human_body_proportion_estimation_tpu.models.efficientdet import (  # noqa: E402
    EFFICIENTDET_LITE0,
    EfficientDet,
)
from human_body_proportion_estimation_tpu.models import tf_import as TI  # noqa: E402

CFG = EFFICIENTDET_LITE0


# --------------------------------------------------------------------- #
# TF oracle (independent re-implementation, automl names/topology)


def _bn(a, x, name, eps=1e-3):
    return tf.nn.batch_normalization(
        x, a[f"{name}/moving_mean"], a[f"{name}/moving_variance"],
        a[f"{name}/beta"], a[f"{name}/gamma"], eps,
    )


def _conv(a, x, name, stride=1):
    return tf.nn.conv2d(x, a[name], strides=stride, padding="SAME")


def _dw(a, x, name, stride=1):
    return tf.nn.depthwise_conv2d(
        x, a[name], [1, stride, stride, 1], "SAME"
    )


def _backbone(a, x):
    bb = CFG.backbone.tf_name
    x = tf.nn.relu6(_bn(a, _conv(a, x, f"{bb}/stem/conv2d/kernel", 2),
                        f"{bb}/stem/tpu_batch_normalization"))
    feats = []
    k = 0
    for si, (e, _c, r, s, _k) in enumerate(CFG.backbone.stages):
        for bi in range(r):
            stride = s if bi == 0 else 1
            blk = f"{bb}/blocks_{k}"
            inp = x
            h = x
            if e != 1:
                h = tf.nn.relu6(_bn(a, _conv(a, h, f"{blk}/conv2d/kernel"),
                                    f"{blk}/tpu_batch_normalization"))
                h = tf.nn.relu6(_bn(
                    a, _dw(a, h, f"{blk}/depthwise_conv2d/depthwise_kernel",
                           stride),
                    f"{blk}/tpu_batch_normalization_1"))
                h = _bn(a, _conv(a, h, f"{blk}/conv2d_1/kernel"),
                        f"{blk}/tpu_batch_normalization_2")
            else:
                h = tf.nn.relu6(_bn(
                    a, _dw(a, h, f"{blk}/depthwise_conv2d/depthwise_kernel",
                           stride),
                    f"{blk}/tpu_batch_normalization"))
                h = _bn(a, _conv(a, h, f"{blk}/conv2d/kernel"),
                        f"{blk}/tpu_batch_normalization_1")
            if stride == 1 and inp.shape[-1] == h.shape[-1]:
                h = h + inp
            x = h
            k += 1
        if si in (2, 4, 6):
            feats.append(x)
    return feats


# automl node graph for levels 3..7: (output level index, input node ids);
# input nodes 0..4 are P3raw..P7, fnode f creates node f+5
_FNODES = [
    (3, [3, 4]),      # node 5:  P6'
    (2, [2, 5]),      # node 6:  P5'
    (1, [1, 6]),      # node 7:  P4'
    (0, [0, 7]),      # node 8:  P3'
    (1, [1, 7, 8]),   # node 9:  P4''
    (2, [2, 6, 9]),   # node 10: P5''
    (3, [3, 5, 10]),  # node 11: P6''
    (4, [4, 11]),     # node 12: P7''
]


def _bifpn_cell(a, level_feats, cell):
    nodes = list(level_feats)
    for f, (lvl, inputs) in enumerate(_FNODES):
        nid = len(nodes)
        target = nodes[lvl]
        summed = None
        for off in inputs:
            t = nodes[off]
            if t.shape[-1] != CFG.fpn_channels:
                rn = f"{cell}/fnode{f}/resample_0_{off}_{nid}"
                t = _bn(a, _conv(a, t, f"{rn}/conv2d/kernel"), f"{rn}/bn")
            if t.shape[1] < target.shape[1]:
                t = tf.image.resize(
                    t, (target.shape[1], target.shape[2]), method="nearest"
                )
            elif t.shape[1] > target.shape[1]:
                t = tf.nn.max_pool2d(t, 3, 2, "SAME")
            summed = t if summed is None else summed + t
        oc = f"{cell}/fnode{f}/op_after_combine{nid}"
        h = tf.nn.relu6(summed)
        h = _dw(a, h, f"{oc}/conv/depthwise_kernel")
        h = _conv(a, h, f"{oc}/conv/pointwise_kernel") + a[f"{oc}/conv/bias"]
        nodes.append(_bn(a, h, f"{oc}/bn"))
    return nodes[8:13]  # P3', P4'', P5'', P6'', P7''


def _head(a, feats, net, tag, repeats):
    outs = []
    for li, x in enumerate(feats):
        for r in range(repeats):
            x = _dw(a, x, f"{net}/{tag}-{r}/depthwise_kernel")
            x = _conv(a, x, f"{net}/{tag}-{r}/pointwise_kernel") \
                + a[f"{net}/{tag}-{r}/bias"]
            x = tf.nn.relu6(_bn(a, x, f"{net}/{tag}-{r}-bn-{li + 3}"))
        x = _dw(a, x, f"{net}/{tag}-predict/depthwise_kernel")
        x = _conv(a, x, f"{net}/{tag}-predict/pointwise_kernel") \
            + a[f"{net}/{tag}-predict/bias"]
        outs.append(x)
    return outs


def tf_oracle(a, images):
    x = (tf.cast(images, tf.float32) - 127.0) / 128.0
    c3, c4, c5 = _backbone(a, x)
    p6 = tf.nn.max_pool2d(
        _bn(a, _conv(a, c5, "resample_p6/conv2d/kernel"), "resample_p6/bn"),
        3, 2, "SAME",
    )
    p7 = tf.nn.max_pool2d(p6, 3, 2, "SAME")
    feats = [c3, c4, c5, p6, p7]
    for c in range(CFG.fpn_repeats):
        feats = _bifpn_cell(a, feats, f"fpn_cells/cell_{c}")
    cls = _head(a, feats, "class_net", "class", CFG.head_repeats)
    box = _head(a, feats, "box_net", "box", CFG.head_repeats)
    b = int(images.shape[0])
    cls_flat = np.concatenate(
        [o.numpy().reshape(b, -1, CFG.num_classes) for o in cls], axis=1
    )
    box_flat = np.concatenate(
        [o.numpy().reshape(b, -1, 4) for o in box], axis=1
    )
    return cls_flat, box_flat


# --------------------------------------------------------------------- #
# fixtures


@pytest.fixture(scope="module")
def flax_init():
    model = EfficientDet(config=CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.fixture(scope="module")
def rand_arrays(flax_init):
    """Healthy-magnitude random tensors under the automl names."""
    _, variables = flax_init
    template = TI.export_tf_efficientdet(variables, CFG)
    rng = np.random.default_rng(42)
    out = {}
    for name, t in template.items():
        if name.endswith(("/gamma", "/moving_variance")):
            out[name] = rng.uniform(0.8, 1.2, t.shape).astype(np.float32)
        elif name.endswith(("/beta", "/moving_mean", "/bias")):
            out[name] = rng.normal(0, 0.05, t.shape).astype(np.float32)
        else:  # conv/depthwise kernels
            fan_in = int(np.prod(t.shape[:-1]))
            out[name] = rng.normal(
                0, np.sqrt(2.0 / fan_in), t.shape
            ).astype(np.float32)
    return out


# --------------------------------------------------------------------- #
# tests


def test_forward_equivalence_vs_tf_oracle(flax_init, rand_arrays):
    model, variables = flax_init
    imported = TI.import_tf_efficientdet(rand_arrays, variables, CFG,
                                         strict=True)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (1, 128, 128, 3)).astype(np.float32)

    cls_j, box_j = model.apply(imported, jnp.asarray(img))
    cls_t, box_t = tf_oracle(rand_arrays, tf.constant(img))

    # non-vacuous: real signal flowed through
    assert np.asarray(cls_j).std() > 1e-4
    np.testing.assert_allclose(np.asarray(cls_j), cls_t, rtol=1e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(box_j), box_t, rtol=1e-3,
                               atol=2e-3)


def test_export_import_exact_round_trip(flax_init, rand_arrays):
    _, variables = flax_init
    imported = TI.import_tf_efficientdet(rand_arrays, variables, CFG,
                                         strict=True)
    back = TI.export_tf_efficientdet(imported, CFG)
    assert set(back) == set(rand_arrays)
    for name in rand_arrays:
        np.testing.assert_array_equal(back[name], rand_arrays[name])


def test_map_covers_every_flax_leaf(flax_init):
    """No leaf may survive an import untouched (silent random weights)."""
    _, variables = flax_init
    covered = set()
    for ent in TI.efficientdet_map(CFG):
        if ent.kind == "bn":
            covered.add(("params",) + ent.flax_path + ("scale",))
            covered.add(("params",) + ent.flax_path + ("bias",))
            covered.add(("batch_stats",) + ent.flax_path + ("mean",))
            covered.add(("batch_stats",) + ent.flax_path + ("var",))
        else:
            covered.add(("params",) + ent.flax_path)

    leaves = set()
    flat, _ = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}
    )
    for path, _v in flat:
        leaves.add(tuple(p.key for p in path))
    missing = leaves - covered
    assert not missing, f"unmapped flax leaves: {sorted(missing)[:10]}"
    extra = covered - leaves
    assert not extra, f"map entries without flax leaves: {sorted(extra)[:10]}"


def test_checkpoint_file_roundtrip_and_ema(rand_arrays, tmp_path):
    tf1 = tf.compat.v1
    subset = dict(list(rand_arrays.items())[:6])
    stem_key = f"{CFG.backbone.tf_name}/stem/conv2d/kernel"
    assert stem_key in subset
    ema_val = subset[stem_key] + 1.0

    graph = tf1.Graph()
    with graph.as_default():
        for name, val in subset.items():
            tf1.get_variable(name, initializer=tf.constant(val))
        tf1.get_variable(f"{stem_key}/ExponentialMovingAverage",
                         initializer=tf.constant(ema_val))
        tf1.get_variable("global_step", initializer=tf.constant(7))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            path = saver.save(sess, str(tmp_path / "model.ckpt"))

    loaded = TI.load_tf_checkpoint_arrays(path, prefer_ema=True)
    assert "global_step" not in loaded
    assert f"{stem_key}/ExponentialMovingAverage" not in loaded
    np.testing.assert_array_equal(loaded[stem_key], ema_val)  # EMA wins
    for name in subset:
        if name == stem_key:
            continue
        np.testing.assert_array_equal(loaded[name], subset[name])

    raw = TI.load_tf_checkpoint_arrays(path, prefer_ema=False)
    np.testing.assert_array_equal(raw[stem_key], subset[stem_key])


def test_import_strict_on_missing(flax_init, rand_arrays):
    _, variables = flax_init
    partial = dict(rand_arrays)
    del partial["resample_p6/conv2d/kernel"]
    with pytest.raises(KeyError):
        TI.import_tf_efficientdet(partial, variables, CFG, strict=True)
    # non-strict skips it
    TI.import_tf_efficientdet(partial, variables, CFG, strict=False)


def test_import_shape_mismatch_raises(flax_init, rand_arrays):
    _, variables = flax_init
    wrong = dict(rand_arrays)
    key = "resample_p6/conv2d/kernel"
    wrong[key] = np.zeros((1, 1, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        TI.import_tf_efficientdet(wrong, variables, CFG, strict=True)
