"""Proportion geometry parity vs an oracle porting the reference's
dict/set logic (modules/pose_estimator.py:130-200)."""

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.ops import proportions as P


def oracle_dist_dict(keypts, ignored_idx, pixel_to_cm):
    """Independent numpy port of _get_kp_dict + _calc_dist_betw_keypts +
    get_keypoint_dist_dict, with float (not int-truncated) midpoints."""
    names = P.IDX_TO_KEYPOINTS
    uset = {v for k, v in names.items() if k not in ignored_idx}
    pts = {names[i]: np.asarray(keypts[i], np.float64) for i in range(17)}
    if {"rshoulder", "lshoulder"} <= uset:
        pts["chest"] = (pts["rshoulder"] + pts["lshoulder"]) / 2
        uset.add("chest")
    if {"rhip", "lhip"} <= uset:
        pts["crotch"] = (pts["rhip"] + pts["lhip"]) / 2
        uset.add("crotch")
    spec = {
        "shoulder": ("rshoulder", "lshoulder"),
        "torso": ("crotch", "chest"),
        "lshoulder_lelbow": ("rshoulder", "relbow"),
        "rshoulder_relbow": ("lshoulder", "lelbow"),
        "lwrist_lelbow": ("rwrist", "relbow"),
        "rwrist_relbow": ("lwrist", "lelbow"),
        "rhip_lhip": ("lhip", "rhip"),
        "rhip_rknee": ("lhip", "lknee"),
        "lhip_lknee": ("rhip", "rknee"),
        "rankle_rknee": ("lankle", "lknee"),
        "lankle_lknee": ("rankle", "rknee"),
    }
    out = {}
    for name, (a, b) in spec.items():
        if {a, b} <= uset:
            d = float(np.linalg.norm(pts[a] - pts[b]))
            out[name] = d * pixel_to_cm if d > 0 else P.NOT_VISIBLE
        else:
            out[name] = P.NOT_VISIBLE
    return out


def _compare(keypts, ignored, pixel_to_cm):
    vis = np.ones(17, bool)
    vis[list(ignored)] = False
    res = P.segment_lengths(
        jnp.asarray(keypts), jnp.asarray(vis), jnp.float32(pixel_to_cm)
    )
    got = P.to_dist_dict(np.asarray(res.lengths_cm), np.asarray(res.visible))
    expect = oracle_dist_dict(keypts, ignored, pixel_to_cm)
    assert list(got) == list(expect), "segment name order must match reference"
    for k in expect:
        if isinstance(expect[k], str):
            assert got[k] == expect[k], k
        else:
            np.testing.assert_allclose(got[k], expect[k], rtol=1e-4, atol=1e-3)


def test_all_visible(rng):
    kp = rng.uniform(0, 400, (17, 2)).astype(np.float32)
    _compare(kp, set(), 175.0 / 350.0)


def test_some_ignored(rng):
    kp = rng.uniform(0, 400, (17, 2)).astype(np.float32)
    _compare(kp, {9, 15}, 0.5)  # rwrist + rankle gated


def test_shoulder_gated_kills_torso(rng):
    kp = rng.uniform(0, 400, (17, 2)).astype(np.float32)
    vis = np.ones(17, bool)
    vis[5] = False  # rshoulder
    res = P.segment_lengths(jnp.asarray(kp), jnp.asarray(vis), jnp.float32(0.5))
    d = P.to_dist_dict(np.asarray(res.lengths_cm), np.asarray(res.visible))
    assert d["shoulder"] == P.NOT_VISIBLE
    assert d["torso"] == P.NOT_VISIBLE  # chest midpoint unavailable
    assert d["lshoulder_lelbow"] == P.NOT_VISIBLE  # uses rshoulder kp
    assert not isinstance(d["rhip_lhip"], str)


def test_coincident_points_not_visible():
    kp = np.zeros((17, 2), np.float32)  # all coincident -> zero distances
    vis = np.ones(17, bool)
    res = P.segment_lengths(jnp.asarray(kp), jnp.asarray(vis), jnp.float32(1.0))
    d = P.to_dist_dict(np.asarray(res.lengths_cm), np.asarray(res.visible))
    assert all(v == P.NOT_VISIBLE for v in d.values())


def test_int_midpoints_exact_reference_parity(rng):
    """int_midpoints=True reproduces the reference's truncated chest/crotch
    (pose_estimator.py:146-153: int(r + l) // 2 per coordinate)."""
    kp = rng.uniform(0, 400, (17, 2)).astype(np.float32)
    res = P.segment_lengths(
        jnp.asarray(kp), jnp.ones(17, bool), jnp.float32(0.5),
        int_midpoints=True,
    )
    got = P.to_dist_dict(np.asarray(res.lengths_cm), np.asarray(res.visible))
    chest = np.array([int(kp[5, c] + kp[6, c]) // 2 for c in range(2)],
                     np.float64)
    crotch = np.array([int(kp[11, c] + kp[12, c]) // 2 for c in range(2)],
                      np.float64)
    expect = float(np.linalg.norm(crotch - chest)) * 0.5
    np.testing.assert_allclose(got["torso"], expect, rtol=1e-5, atol=1e-4)
    # non-torso segments are untouched by the flag
    res_f = P.segment_lengths(
        jnp.asarray(kp), jnp.ones(17, bool), jnp.float32(0.5)
    )
    np.testing.assert_allclose(
        np.asarray(res.lengths_cm)[:1], np.asarray(res_f.lengths_cm)[:1]
    )
    np.testing.assert_allclose(
        np.asarray(res.lengths_cm)[2:], np.asarray(res_f.lengths_cm)[2:]
    )


def test_vectorized_over_person_slots(rng):
    kp = rng.uniform(0, 400, (4, 3, 17, 2)).astype(np.float32)
    vis = np.ones((4, 3, 17), bool)
    p2c = rng.uniform(0.2, 0.8, (4, 3)).astype(np.float32)
    res = P.segment_lengths(jnp.asarray(kp), jnp.asarray(vis), jnp.asarray(p2c))
    assert res.lengths_cm.shape == (4, 3, 11)
    single = P.segment_lengths(
        jnp.asarray(kp[1, 2]), jnp.asarray(vis[1, 2]), jnp.asarray(p2c[1, 2])
    )
    np.testing.assert_allclose(
        np.asarray(res.lengths_cm)[1, 2], np.asarray(single.lengths_cm),
        rtol=1e-5,
    )
