"""Heatmap decode + remap parity vs a numpy oracle of the reference math."""

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops import heatmap as H


def numpy_decode_oracle(heatmap):
    """Port of PoseEstimator.get_max_pred_keypts_from_heatmap semantics
    (modules/pose_estimator.py:75-99)."""
    k, h, w = heatmap.shape
    flat = heatmap.reshape(k, -1)
    idx, vals = np.argmax(flat, 1), np.max(flat, 1)
    kpts = np.stack([idx % w, idx // w], -1).astype(np.float32)
    kpts *= (vals > 0)[:, None]
    return kpts, vals


def test_decode_matches_oracle(rng):
    hm = rng.normal(0, 1, (17, 96, 72)).astype(np.float32)
    kp, sc = H.decode_heatmaps(jnp.asarray(hm))
    ekp, esc = numpy_decode_oracle(hm)
    np.testing.assert_allclose(np.asarray(kp), ekp)
    np.testing.assert_allclose(np.asarray(sc), esc, rtol=1e-6)


def test_decode_batched(rng):
    hm = rng.normal(0, 1, (2, 3, 17, 96, 72)).astype(np.float32)
    kp, sc = H.decode_heatmaps(jnp.asarray(hm))
    assert kp.shape == (2, 3, 17, 2)
    for b in range(2):
        for p in range(3):
            ekp, esc = numpy_decode_oracle(hm[b, p])
            np.testing.assert_allclose(np.asarray(kp[b, p]), ekp)


def test_remap_to_image_matches_reference_math(rng):
    # reference person_det_pose_edet4_trtserver.py:151-160
    hm_h, hm_w = 96, 72
    kp = rng.uniform(0, (hm_w, hm_h), (17, 2)).astype(np.float32)
    box = np.array([53.7, 101.2, 420.9, 280.4], np.float32)  # y1 x1 y2 x2 px

    x1, y1 = int(box[1]), int(box[0])
    x2, y2 = int(box[3]), int(box[2])
    expect = kp / [hm_w, hm_h] * [x2 - x1, y2 - y1] + [x1, y1]

    got = np.asarray(
        H.remap_to_image(jnp.asarray(kp), jnp.asarray(box), (hm_h, hm_w))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-3)


def test_gate_keypoints():
    thres = [0.45, 0.46, 0.45, 0.40, 0.34, 0.10, 0.10, 0.10, 0.10,
             0.24, 0.30, 0.11, 0.10, 0.15, 0.10, 0.25, 0.20]
    scores = np.full(17, 0.2, np.float32)
    vis = np.asarray(H.gate_keypoints(jnp.asarray(scores), tuple(thres)))
    expect = scores >= np.asarray(thres)
    np.testing.assert_array_equal(vis, expect)


def test_subpixel_refinement_shifts_toward_mass():
    hm = np.zeros((1, 17, 16, 16), np.float32)
    # peak at (8, 8) with a heavier right neighbor -> +0.25 in x;
    # heavier top neighbor -> -0.25 in y
    hm[0, :, 8, 8] = 1.0
    hm[0, :, 8, 9] = 0.6
    hm[0, :, 8, 7] = 0.2
    hm[0, :, 7, 8] = 0.5
    hm[0, :, 9, 8] = 0.1
    kp, sc = H.decode_heatmaps(jnp.asarray(hm))
    refined = np.asarray(H.refine_subpixel(kp, jnp.asarray(hm)))
    np.testing.assert_allclose(refined[0, :, 0], 8.25)
    np.testing.assert_allclose(refined[0, :, 1], 7.75)


def test_subpixel_edge_peaks_untouched():
    hm = np.zeros((1, 17, 16, 16), np.float32)
    hm[0, :, 0, 15] = 1.0  # corner peak
    kp, _ = H.decode_heatmaps(jnp.asarray(hm))
    refined = np.asarray(H.refine_subpixel(kp, jnp.asarray(hm)))
    np.testing.assert_array_equal(refined, np.asarray(kp))
