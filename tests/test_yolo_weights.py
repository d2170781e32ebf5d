"""YOLOv5 converter: exact round trip + forward equivalence (yolov5s)."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.yolov5 import (
    YOLOV5S,
    YoloV5,
)
from human_body_proportion_estimation_tpu.models.yolo_weights import (
    export_torch_yolov5,
    import_torch_yolov5,
)


def test_yolov5_roundtrip_and_forward_equivalence():
    model = YoloV5(config=YOLOV5S, dtype=jnp.float32)
    a = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)))
    sd = export_torch_yolov5(a, YOLOV5S)
    # torch naming sanity
    assert "model.0.conv.weight" in sd
    assert sd["model.0.conv.weight"].shape[2:] == (6, 6)  # stem 6x6, OIHW
    assert "model.24.m.2.bias" in sd
    assert "model.9.cv2.conv.weight" in sd  # SPPF

    b = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 64, 64, 3)))
    restored = import_torch_yolov5(sd, b, YOLOV5S, strict=True)

    # every leaf recovered exactly
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(restored))
    bad = [
        jax.tree_util.keystr(p)
        for p, leaf in flat_a
        if not np.array_equal(np.asarray(leaf), np.asarray(flat_r[p]))
    ]
    assert not bad, f"unmapped leaves: {bad[:8]}"

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ya = model.apply(a, x)
    yb = model.apply(jax.tree.map(jnp.asarray, restored), x)
    for ha, hb in zip(ya, yb):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=1e-6)
