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
