"""crop_and_resize parity vs tf.image.crop_and_resize (the exact op the
reference fuses into its detector graph, models/conv.py:67-70)."""

import numpy as np
import jax.numpy as jnp
import pytest

from human_body_proportion_estimation_tpu.ops.crop import crop_and_resize

tf = pytest.importorskip("tensorflow")


def _tf_oracle(img, boxes, crop_hw):
    out = tf.image.crop_and_resize(
        img[None].astype(np.float32),
        boxes.astype(np.float32),
        np.zeros(len(boxes), np.int32),
        crop_hw,
    )
    return out.numpy()


def test_crop_and_resize_matches_tf(rng):
    img = rng.uniform(0, 1, (480, 640, 3)).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.8, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [0.25, 0.4, 0.5, 0.45],  # skinny crop
        ],
        np.float32,
    )
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), 384, 288))
    expect = _tf_oracle(img, boxes, (384, 288))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_crop_and_resize_extrapolation_zero(rng):
    img = rng.uniform(0.5, 1, (64, 64, 3)).astype(np.float32)
    boxes = np.array([[-0.5, -0.5, 1.5, 1.5]], np.float32)  # out of range
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), 32, 32))
    expect = _tf_oracle(img, boxes, (32, 32))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
    assert got[0, 0, 0, 0] == 0.0  # corners extrapolate to 0


def test_crop_and_resize_degenerate_box(rng):
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    boxes = np.array([[0.5, 0.5, 0.5, 0.5]], np.float32)  # zero-area
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), 16, 16))
    expect = _tf_oracle(img, boxes, (16, 16))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
