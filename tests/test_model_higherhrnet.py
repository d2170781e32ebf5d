"""HigherHRNet: output contract (1/4 heatmaps+tags, 1/2 heatmaps)."""

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.models.higherhrnet import (
    HigherHRNet,
)
from human_body_proportion_estimation_tpu.ops.heatmap import decode_heatmaps


def test_output_shapes_and_decode():
    model = HigherHRNet(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["output_1"].shape == (1, 16, 8, 34)   # K heatmaps + K tags
    assert out["output_2"].shape == (1, 32, 16, 17)  # 1/2-res heatmaps
    # the reference consumes output_2 as plain heatmaps — decodable as such
    hm = jnp.moveaxis(out["output_2"], -1, 1)
    kp, scores = decode_heatmaps(hm)
    assert kp.shape == (1, 17, 2)
    assert np.all(np.isfinite(np.asarray(kp)))
