"""Composite parity of the det->pose glue vs the reference's fused TF graph.

Rebuilds the exact tensor program of reference `models/conv.py:37-80`
(bbox expand -> clip -> normalize -> /255 -> crop_and_resize 384x288) in
TF as the oracle and compares our ops chain
(`expand_clip_normalize_yxyx` + `crop_and_resize`) end to end on the same
inputs — the strongest available check that our in-jit glue equals the
graph Triton served.
"""

import numpy as np
import jax.numpy as jnp
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


tf = pytest.importorskip("tensorflow")

from human_body_proportion_estimation_tpu.ops.boxes import (  # noqa: E402
    expand_clip_normalize_yxyx,
)
from human_body_proportion_estimation_tpu.ops.crop import (  # noqa: E402
    crop_and_resize,
)


def tf_reference_glue(image_uint8, boxes_yxyx, x_change, y_change,
                      crop_size=(384, 288)):
    """TF oracle mirroring conv.py's expand/clip/normalize/crop math."""
    img = tf.cast(image_uint8, tf.float32)
    h = tf.cast(tf.shape(img)[0], tf.float32)
    w = tf.cast(tf.shape(img)[1], tf.float32)
    y1 = tf.clip_by_value(boxes_yxyx[:, 0] - y_change, 0.0, h)
    x1 = tf.clip_by_value(boxes_yxyx[:, 1] - x_change, 0.0, w)
    y2 = tf.clip_by_value(boxes_yxyx[:, 2] + y_change, 0.0, h)
    x2 = tf.clip_by_value(boxes_yxyx[:, 3] + x_change, 0.0, w)
    norm = tf.stack([y1, x1, y2, x2], axis=1) / tf.stack([h, w, h, w])
    crops = tf.image.crop_and_resize(
        (img / 255.0)[None],
        norm,
        tf.zeros(tf.shape(norm)[0], tf.int32),
        crop_size,
    )
    return norm.numpy(), crops.numpy()


def test_glue_matches_reference_graph(rng):
    image = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    boxes = np.array(
        [
            [50.0, 100.0, 470.0, 300.0],
            [0.0, 0.0, 480.0, 640.0],
            [200.5, 300.25, 310.75, 420.0],   # fractional corners
            [470.0, 630.0, 480.0, 640.0],     # clipping edge case
        ],
        np.float32,
    )
    x_change, y_change = float(640 // 17), 0.0

    expect_norm, expect_crops = tf_reference_glue(
        image, tf.constant(boxes), x_change, y_change
    )

    got_norm = np.asarray(
        expand_clip_normalize_yxyx(
            jnp.asarray(boxes), jnp.float32(x_change), jnp.float32(y_change),
            480, 640,
        )
    )
    got_crops = np.asarray(
        crop_and_resize(
            jnp.asarray(image, jnp.float32) / 255.0,
            jnp.asarray(got_norm), 384, 288,
        )
    )
    np.testing.assert_allclose(got_norm, expect_norm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_crops, expect_crops, rtol=1e-4, atol=1e-4)
