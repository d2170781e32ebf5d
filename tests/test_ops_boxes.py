"""Box math parity vs independent numpy oracles of the reference semantics."""

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops import boxes as B


def _rand_xyxy(rng, n):
    x1y1 = rng.uniform(0, 300, (n, 2))
    wh = rng.uniform(1, 200, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)


def test_xyxy_xywh_roundtrip(rng):
    b = _rand_xyxy(rng, 64)
    out = np.asarray(B.xywh2xyxy(B.xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


def test_box_iou_matches_numpy_oracle(rng):
    # oracle: the torchvision formula the reference vendors
    # (modules/onnx_utils.py:98-122), re-derived in numpy
    a = _rand_xyxy(rng, 40)
    b = _rand_xyxy(rng, 30)

    def area(x):
        return (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])

    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(rb - lt, 0, None), -1)
    expect = inter / (area(a)[:, None] + area(b)[None] - inter)

    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_scale_coords_letterbox_inversion(rng):
    # boxes drawn on a 640x640 letterboxed canvas of a 480x640 image must map
    # back into the original image (reference onnx_utils.py:252-266 semantics)
    orig_hw = (480, 640)
    model_hw = (640, 640)
    gain = max(model_hw) / max(orig_hw)
    pad_y = (model_hw[0] - orig_hw[0] * gain) / 2

    bx = np.array([[100.0, 200.0, 300.0, 400.0]], np.float32)
    got = np.asarray(
        B.scale_coords_letterbox(jnp.asarray(bx), model_hw, orig_hw)
    )[0]
    expect = np.array(
        [100.0 / gain, (200.0 - pad_y) / gain,
         300.0 / gain, (400.0 - pad_y) / gain]
    )
    expect = np.clip(expect, 0, [640, 480, 640, 480])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-3)


def test_expand_clip_normalize_yxyx():
    # models/conv.py:39-57 semantics: dilate, clip to image, normalize
    h, w = 480, 640
    box = jnp.asarray([[10.0, 5.0, 400.0, 630.0]])
    out = np.asarray(
        B.expand_clip_normalize_yxyx(box, jnp.float32(37.0), jnp.float32(0.0), h, w)
    )[0]
    np.testing.assert_allclose(
        out, [10 / 480, 0.0, 400 / 480, 640 / 640], rtol=1e-6
    )
