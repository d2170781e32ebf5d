"""Pallas decode kernel parity vs the jnp reference (interpret mode on the
CPU mesh; the compiled path is exercised on TPU by the drive scripts)."""

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops.heatmap import decode_heatmaps
from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
    decode_heatmaps_pallas,
)


def test_pallas_decode_matches_jnp(rng):
    hm = rng.normal(0, 1, (6, 17, 96, 72)).astype(np.float32)
    kp_ref, sc_ref = decode_heatmaps(jnp.asarray(hm))
    kp, sc = decode_heatmaps_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kp_ref))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_ref), rtol=1e-6)


def test_pallas_decode_zero_maps(rng):
    hm = np.full((2, 17, 96, 72), -1.0, np.float32)  # all scores <= 0
    kp, sc = decode_heatmaps_pallas(jnp.asarray(hm), interpret=True)
    np.testing.assert_array_equal(np.asarray(kp), 0.0)  # pred_mask zeroing
    assert np.all(np.asarray(sc) < 0)


def test_pallas_nms_sweep_matches_jnp(rng):
    from human_body_proportion_estimation_tpu.ops.nms import nms_mask
    from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
        nms_sweep_pallas,
    )

    for trial in range(3):
        n = 128
        x1y1 = rng.uniform(0, 300, (n, 2))
        wh = rng.uniform(10, 150, (n, 2))
        boxes = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
        scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
        scores[-5:] = 0.0  # dead padding rows
        for t in (0.5, 0.3):
            ref = np.asarray(nms_mask(jnp.asarray(boxes),
                                      jnp.asarray(scores), t))
            got = np.asarray(nms_sweep_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), t, interpret=True
            ))
            np.testing.assert_array_equal(got, ref)
