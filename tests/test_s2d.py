"""Exactness of the space-to-depth conv reparametrizations (ops/s2d.py).

Each packed kernel applied in the packed domain must reproduce the
canonical conv bit-for-bit up to f32 reassociation, including borders
(zero padding). These are the building blocks of the packed HRNet
high-res branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_body_proportion_estimation_tpu.ops import s2d


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.fixture
def keys():
    return jax.random.split(jax.random.PRNGKey(7), 4)


def test_s2d_roundtrip(keys):
    x = _rand(keys[0], (2, 8, 6, 5))
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space(s2d.space_to_depth(x))), np.asarray(x)
    )


def test_inner3x3(keys):
    x = _rand(keys[0], (2, 12, 8, 3))
    w = _rand(keys[1], (3, 3, 3, 5))
    ref = _conv(x, w, 1, "SAME")
    strides, pad = s2d.CONV_SPECS["inner"]
    got = s2d.depth_to_space(
        _conv(s2d.space_to_depth(x), s2d.pack_inner3x3(w), strides[0], pad)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_producer3x3(keys):
    x = _rand(keys[0], (2, 12, 8, 7))
    w = _rand(keys[1], (3, 3, 7, 5))
    ref = _conv(x, w, 1, "SAME")
    strides, pad = s2d.CONV_SPECS["producer"]
    got = s2d.depth_to_space(_conv(x, s2d.pack_producer3x3(w), strides[0], pad))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5
    )


def test_consumer3x3_s2(keys):
    x = _rand(keys[0], (2, 12, 8, 3))
    w = _rand(keys[1], (3, 3, 3, 5))
    # canonical: torch-style symmetric pad (1,1), stride 2
    ref = _conv(x, w, 2, ((1, 1), (1, 1)))
    strides, pad = s2d.CONV_SPECS["consumer"]
    got = _conv(s2d.space_to_depth(x), s2d.pack_consumer3x3_s2(w),
                strides[0], pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_pointwise_tiled_upsample(keys, factor):
    from human_body_proportion_estimation_tpu.models.layers import (
        upsample_nearest,
    )

    x = _rand(keys[0], (2, 6, 4, 3))
    w = _rand(keys[1], (1, 1, 3, 5))
    ref = upsample_nearest(_conv(x, w, 1, "SAME"), factor)
    packed = _conv(x, s2d.pack_pointwise_tiled(w), 1, "SAME")
    if factor > 2:
        packed = upsample_nearest(packed, factor // 2)
    np.testing.assert_allclose(
        np.asarray(s2d.depth_to_space(packed)), np.asarray(ref), atol=1e-5
    )


def test_pointwise_blockdiag(keys):
    x = _rand(keys[0], (2, 6, 4, 3))
    w = _rand(keys[1], (1, 1, 3, 5))
    ref = _conv(x, w, 1, "SAME")
    got = s2d.depth_to_space(
        _conv(s2d.space_to_depth(x), s2d.pack_pointwise_blockdiag(w), 1,
              "SAME")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
