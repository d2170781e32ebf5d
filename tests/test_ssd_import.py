"""SSD-MobileNetV1 tflite import: REAL-WEIGHT parity vs the tflite
interpreter on the reference's fixture images."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from human_body_proportion_estimation_tpu.models.tflite_import import (  # noqa: E402
    DEFAULT_TFLITE_PATH,
    load_ssd_weights,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEFAULT_TFLITE_PATH),
    reason="reference ssd.tflite not available",
)

FIXTURE = "/root/reference/media/imgs/two people.jpg"


@pytest.fixture(scope="module")
def loaded():
    return load_ssd_weights()


@pytest.fixture(scope="module")
def fixture_input():
    import cv2

    img = cv2.imread(FIXTURE)[..., ::-1]
    return cv2.resize(img, (300, 300)).astype(np.uint8)


@pytest.fixture(scope="module")
def tflite_oracle(fixture_input):
    it = tf.lite.Interpreter(model_path=DEFAULT_TFLITE_PATH)
    it.allocate_tensors()
    it.set_tensor(it.get_input_details()[0]["index"], fixture_input[None])
    it.invoke()
    outs = it.get_output_details()
    return {
        "boxes": it.get_tensor(outs[0]["index"])[0],
        "classes": it.get_tensor(outs[1]["index"])[0],
        "scores": it.get_tensor(outs[2]["index"])[0],
    }


def test_weight_tree_matches_model(loaded):
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
        SSDMobileNetV1,
    )

    variables, anchors = loaded
    assert anchors.shape == (1917, 4)
    assert 0 < anchors.min() and anchors.max() <= 2.0  # normalized units
    model = SSDMobileNetV1(dtype=jnp.float32)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    )
    ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, variables["params"])
    assert ref_shapes == got_shapes


def test_detections_match_tflite(loaded, fixture_input, tflite_oracle):
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
        SSDMobileNetV1,
        ssd_postprocess,
    )

    variables, anchors = loaded
    model = SSDMobileNetV1(dtype=jnp.float32)
    box_regs, logits = model.apply(
        variables, jnp.asarray(fixture_input[None])
    )
    det = ssd_postprocess(box_regs[0], logits[0], jnp.asarray(anchors))

    # compare the confident detections (float vs uint8-quantized runtime:
    # scores within ~0.05, boxes within ~0.03 normalized units)
    o_scores = tflite_oracle["scores"]
    strong = o_scores >= 0.4
    n = int(strong.sum())
    assert n >= 2  # the fixture contains two persons
    np.testing.assert_array_equal(
        np.asarray(det.classes)[:n], tflite_oracle["classes"][strong]
    )
    np.testing.assert_allclose(
        np.asarray(det.scores)[:n], o_scores[strong], atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(det.boxes)[:n], tflite_oracle["boxes"][strong], atol=0.03
    )


def test_human_detector_finds_two_people():
    import cv2

    from human_body_proportion_estimation_tpu.pipeline.human_detector import (
        HumanDetectorSSD,
    )

    det = HumanDetectorSSD(threshold=0.5)
    img = cv2.imread(FIXTURE)[..., ::-1]
    boxes, scores = det.get_detections(img)
    assert len(boxes) == 2
    assert np.all(scores >= 0.5)
    crops = det.get_crops(img)
    assert len(crops) == 2
    for c in crops:
        assert c.ndim == 3 and c.shape[0] > 50 and c.shape[1] > 20
