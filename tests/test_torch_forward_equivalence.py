"""Converter forward-equivalence against REAL torch graphs (VERDICT #2).

Round-trip tests prove the name mapping is self-consistent; they cannot
catch layout/padding/ordering bugs that survive a round trip. Here the
converter-exported state_dicts load into independent torch implementations
of the official pose_hrnet and ultralytics yolov5 graphs (tests/torch_refs
.py), and the torch forward must match our flax forward.

This is the strongest weight-fidelity check available without network
access: when a real pretrained `pose_hrnet_w32_384x288.pth` (reference
`pose_est_hrnet_trtserver.py:153`) or `yolov5m.pt` is obtained, the same
converter path loads it unchanged.
"""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from human_body_proportion_estimation_tpu.models.hrnet import (  # noqa: E402
    HRNET_W32,
    HRNet,
)
from human_body_proportion_estimation_tpu.models.weights import (  # noqa: E402
    export_torch_hrnet,
    import_torch_hrnet,
)
from human_body_proportion_estimation_tpu.models.yolov5 import (  # noqa: E402
    YOLOV5S,
    YoloV5,
)
from human_body_proportion_estimation_tpu.models.yolo_weights import (  # noqa: E402
    export_torch_yolov5,
    import_torch_yolov5,
)

from torch_refs import TorchPoseHRNet, TorchYoloV5  # noqa: E402


def _to_torch_sd(sd_np):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd_np.items()}


def test_hrnet_forward_matches_official_torch_graph():
    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 128, 96, 3), jnp.float32)
    )
    sd = export_torch_hrnet(variables, HRNET_W32)

    tmodel = TorchPoseHRNet(width=32)
    missing, unexpected = tmodel.load_state_dict(_to_torch_sd(sd),
                                                 strict=False)
    # only BN bookkeeping may be missing ...
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    # ... and only the dead fuse rows of the final module may be unexpected
    # (official pose_hrnet builds the last stage-4 module with
    # multi_scale_output=False, so rows i>=1 don't exist there)
    assert all(k.startswith("stage4.2.fuse_layers.") and
               not k.startswith("stage4.2.fuse_layers.0.")
               for k in unexpected), unexpected
    tmodel.eval()

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (1, 128, 96, 3)).astype(np.float32)
    out_j = np.asarray(model.apply(variables, jnp.asarray(img)))
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    assert out_j.shape == out_t.shape == (1, 32, 24, 17)
    assert out_j.std() > 1e-5  # non-vacuous
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-2)


def test_hrnet_import_inverts_real_torch_weights():
    """Weights born in torch (the real-checkpoint direction) import to the
    same forward."""
    tmodel = TorchPoseHRNet(width=32)
    tmodel.eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05, generator=gen)
                m.running_var.uniform_(0.8, 1.2, generator=gen)
    sd_np = {k: v.numpy() for k, v in tmodel.state_dict().items()
             if not k.endswith("num_batches_tracked")}

    model = HRNet(config=HRNET_W32, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 128, 96, 3), jnp.float32)
    )
    imported = import_torch_hrnet(sd_np, variables, HRNET_W32)

    rng = np.random.default_rng(12)
    img = rng.uniform(0, 1, (1, 128, 96, 3)).astype(np.float32)
    out_j = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, imported), jnp.asarray(img))
    )
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.std() > 1e-5
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=1e-2)


def test_yolov5s_forward_matches_ultralytics_torch_graph():
    model = YoloV5(config=YOLOV5S, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    sd = export_torch_yolov5(variables, YOLOV5S)
    # make eval-mode BN normalization non-trivial (random stats, shared by
    # both sides through the same dict)
    prng = np.random.default_rng(21)
    for k, v in sd.items():
        if k.endswith((".bn.weight", ".bn.running_var")):
            sd[k] = prng.uniform(0.9, 1.1, v.shape).astype(np.float32)
        elif k.endswith((".bn.bias", ".bn.running_mean")):
            sd[k] = prng.normal(0, 0.05, v.shape).astype(np.float32)
    variables = jax.tree.map(
        jnp.asarray, import_torch_yolov5(sd, variables, YOLOV5S)
    )

    tmodel = TorchYoloV5(depth=0.33, width=0.50)
    missing, unexpected = tmodel.load_state_dict(_to_torch_sd(sd),
                                                 strict=False)
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    assert not unexpected, unexpected
    tmodel.eval()

    rng = np.random.default_rng(13)
    img = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    heads_j = model.apply(variables, jnp.asarray(img))
    with torch.no_grad():
        heads_t = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    for hj, ht in zip(heads_j, heads_t):
        hj = np.asarray(hj)
        ht = ht.numpy().transpose(0, 2, 3, 1)
        assert hj.shape == ht.shape
        # 25+ layers of flax-init convs shrink activations to ~1e-6, so
        # compare on the head's own scale (a layout/padding bug shifts
        # whole pixels — orders of magnitude above this tolerance)
        scale = float(np.abs(ht).max()) or 1.0
        np.testing.assert_allclose(hj / scale, ht / scale,
                                   rtol=2e-3, atol=2e-3)
        corr = np.corrcoef(hj.ravel(), ht.ravel())[0, 1]
        assert corr > 0.9999, corr
