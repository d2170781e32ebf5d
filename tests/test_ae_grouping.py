"""Associative-embedding grouping (ops/ae_grouping.py) vs a plain-numpy
greedy oracle, plus synthetic multi-person recovery.

The reference has no bottom-up decode to compare against (it reads only
HigherHRNet's plain heatmaps, pose_est_hrnet_trtserver.py:22-28); the
oracle is an independent loop/list reimplementation of the same greedy AE
semantics (Newell et al. NeurIPS'17)."""

import jax.numpy as jnp
import numpy as np
import pytest

from human_body_proportion_estimation_tpu.ops import ae_grouping as ae

INF = 1e9


def oracle_group(coords, scores, tags, max_people, score_thr, tag_thr):
    """Plain-python greedy AE grouping with identical tie-break rules."""
    k, m = scores.shape
    groups = []  # dicts: tag_sum, tag_cnt, kp {joint: (xy, score)}
    for joint in range(k):
        cand_ok = scores[joint] > score_thr
        # greedy global-argmin matching on |mean_tag - cand_tag|
        cost = np.full((len(groups), m), INF)
        for gi, g in enumerate(groups):
            mean = g["tag_sum"] / g["tag_cnt"]
            for mi in range(m):
                c = abs(mean - tags[joint, mi])
                if cand_ok[mi] and c <= tag_thr:
                    cost[gi, mi] = c
        assigned = np.zeros(m, bool)
        work = cost.copy()
        for _ in range(min(max_people, m)):
            if work.size == 0 or work.min() >= INF / 2:
                break
            gi, mi = np.unravel_index(np.argmin(work), work.shape)
            g = groups[gi]
            g["tag_sum"] += tags[joint, mi]
            g["tag_cnt"] += 1
            g["kp"][joint] = (coords[joint, mi], scores[joint, mi])
            assigned[mi] = True
            work[gi, :] = INF
            work[:, mi] = INF
        for mi in range(m):  # top_k order == score order
            if cand_ok[mi] and not assigned[mi] and len(groups) < max_people:
                groups.append({
                    "tag_sum": float(tags[joint, mi]), "tag_cnt": 1.0,
                    "kp": {joint: (coords[joint, mi], scores[joint, mi])},
                })
    kp = np.zeros((max_people, k, 2), np.float32)
    kps = np.zeros((max_people, k), np.float32)
    valid = np.zeros(max_people, bool)
    for gi, g in enumerate(groups):
        valid[gi] = True
        for joint, (xy, s) in g["kp"].items():
            kp[gi, joint] = xy
            kps[gi, joint] = s
    return kp, kps, valid


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_grouping_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    k, m, p = 6, 5, 4
    coords = rng.integers(0, 48, (k, m, 2)).astype(np.int32)
    # descending scores (top_k contract), some below threshold
    scores = np.sort(rng.random((k, m)).astype(np.float32))[:, ::-1]
    # well-separated tag clusters to avoid float tie ambiguity
    tags = (rng.integers(0, 4, (k, m)) * 3.0
            + rng.normal(0, 0.05, (k, m))).astype(np.float32)

    peaks = ae.Peaks(coords=jnp.asarray(coords), scores=jnp.asarray(scores))
    got = ae.group_keypoints(
        peaks, jnp.asarray(tags), p, score_threshold=0.3, tag_threshold=1.0
    )
    ref_kp, ref_s, ref_valid = oracle_group(
        coords.astype(np.float32), scores, tags, p, 0.3, 1.0
    )
    np.testing.assert_array_equal(np.asarray(got.valid), ref_valid)
    np.testing.assert_allclose(np.asarray(got.keypoints), ref_kp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.scores), ref_s, atol=1e-5)


def _gaussian(h, w, cx, cy, sigma=1.5):
    y, x = np.mgrid[0:h, 0:w]
    return np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2))


def test_bottom_up_recovers_synthetic_people():
    """Two synthetic people with distinct tag values across 4 joints."""
    k, h, w = 4, 64, 48
    people = [
        {"tag": -2.0, "joints": [(10, 12), (14, 20), (9, 30), (15, 40)]},
        {"tag": 2.0, "joints": [(34, 12), (30, 22), (36, 31), (33, 42)]},
    ]
    heat = np.zeros((k, h, w), np.float32)
    tags = np.zeros((k, h, w), np.float32)
    for person in people:
        for j, (cx, cy) in enumerate(person["joints"]):
            heat[j] = np.maximum(heat[j], _gaussian(h, w, cx, cy))
            tags[j, cy, cx] = person["tag"]

    out = ae.decode_bottom_up(
        jnp.asarray(heat), jnp.asarray(tags), max_people=3, max_cands=4,
        score_threshold=0.5, tag_threshold=1.0,
    )
    valid = np.asarray(out.valid)
    assert valid.sum() == 2
    kps = np.asarray(out.keypoints)
    # each group's joints sit exactly at one person's synthetic joints
    recovered = {tuple(map(tuple, kps[i].astype(int))) for i in range(2)}
    expected = {tuple(p["joints"]) for p in people}
    assert recovered == expected


def test_person_score_threshold_kills_phantom_groups():
    """A stray low-amplitude peak that matches no tag cluster opens a
    group; the person-level mean-score gate must mark it invalid while
    keeping the real (high-amplitude) person."""
    k, h, w = 4, 64, 48
    heat = np.zeros((k, h, w), np.float32)
    tags = np.zeros((k, h, w), np.float32)
    joints = [(10, 12), (14, 20), (9, 30), (15, 40)]
    for j, (cx, cy) in enumerate(joints):
        heat[j] = _gaussian(h, w, cx, cy)
        tags[j, cy, cx] = -2.0
    # phantom: one weak bump on joint 0 with a far-away tag value
    heat[0] = np.maximum(heat[0], 0.2 * _gaussian(h, w, 40, 50))
    tags[0, 50, 40] = 3.0

    kw = dict(max_people=3, max_cands=4, score_threshold=0.1,
              tag_threshold=1.0)
    raw = ae.decode_bottom_up(jnp.asarray(heat), jnp.asarray(tags), **kw)
    assert np.asarray(raw.valid).sum() == 2      # phantom group opened
    gated = ae.decode_bottom_up(
        jnp.asarray(heat), jnp.asarray(tags),
        person_score_threshold=0.5, **kw,
    )
    valid = np.asarray(gated.valid)
    assert valid.sum() == 1
    kps = np.asarray(gated.keypoints)[np.nonzero(valid)[0][0]]
    assert tuple(map(tuple, kps.astype(int))) == tuple(joints)


def test_find_peaks_nms():
    hm = np.zeros((1, 16, 16), np.float32)
    hm[0, 5, 5] = 1.0
    hm[0, 5, 6] = 0.9   # suppressed: not a 3x3 local max
    hm[0, 12, 3] = 0.8
    peaks = ae.find_peaks(jnp.asarray(hm), max_cands=3)
    coords = np.asarray(peaks.coords[0])
    scores = np.asarray(peaks.scores[0])
    assert tuple(coords[0]) == (5, 5) and scores[0] == pytest.approx(1.0)
    assert tuple(coords[1]) == (3, 12) and scores[1] == pytest.approx(0.8)
    assert scores[2] < 0.5  # only junk left
