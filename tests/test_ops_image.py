"""Image preprocessing parity vs the reference host-side cv2/PIL ops."""

import numpy as np
import jax.numpy as jnp
import cv2
from PIL import Image

from human_body_proportion_estimation_tpu.ops import image as I


def test_aspect_resize_shape_rules():
    # modules/utils.py:140-159 integer arithmetic
    assert I.aspect_resize_shape(480, 640, 640, 480) == (480, 640)
    assert I.aspect_resize_shape(400, 600, None, 200) == (200, (600 * 200) // 400)
    assert I.aspect_resize_shape(400, 600, 300, None) == ((300 * 400) // 600, 300)
    assert I.aspect_resize_shape(400, 600, None, None) == (400, 600)


def test_resize_bilinear_close_to_cv2(rng):
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    got = np.asarray(I.resize_bilinear(jnp.asarray(img), 480, 640)).astype(np.int32)
    expect = cv2.resize(img, (640, 480), interpolation=cv2.INTER_LINEAR).astype(np.int32)
    # both use half-pixel-center bilinear; allow +-2 uint8 rounding differences
    assert np.mean(np.abs(got - expect)) < 1.0
    assert np.percentile(np.abs(got - expect), 99) <= 2


def test_letterbox_close_to_pil(rng):
    img = rng.integers(0, 256, (300, 500, 3), dtype=np.uint8)
    got = np.asarray(I.letterbox(jnp.asarray(img), 640, 640)).astype(np.int32)
    # oracle: reference letterbox_image (onnx_utils.py:225-235)
    pil = Image.fromarray(img)
    scale = min(640 / 500, 640 / 300)
    nw, nh = int(500 * scale), int(300 * scale)
    resized = pil.resize((nw, nh), Image.BICUBIC)
    canvas = Image.new("RGB", (640, 640), (128, 128, 128))
    canvas.paste(resized, ((640 - nw) // 2, (640 - nh) // 2))
    expect = np.asarray(canvas).astype(np.int32)
    # pad region must be exactly gray
    assert np.all(got[:2] == 128) and np.all(got[-2:] == 128)
    # interior within small interpolation tolerance
    diff = np.abs(got - expect)
    assert np.mean(diff) < 2.0


def test_normalize_and_layout(rng):
    img = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    norm = np.asarray(I.normalize_uint8(jnp.asarray(img)))
    np.testing.assert_allclose(norm, img / 255.0, rtol=1e-6)
    chw = I.hwc_to_chw(jnp.asarray(img))
    assert chw.shape == (2, 3, 8, 8)
    rgb = np.asarray(I.bgr_to_rgb(jnp.asarray(img)))
    np.testing.assert_array_equal(rgb, img[..., ::-1])
