"""Associative-embedding grouping: bottom-up multi-person pose decode.

HigherHRNet's train-time head emits K heatmaps + K associative-embedding
tag maps (models/higherhrnet.py "output_1"); the reference never consumes
the tags (it reads only the "output_2" heatmaps through its top-down
pipeline, `pose_est_hrnet_trtserver.py:22-28`), so bottom-up multi-person
decode is capability the reference lacks. This module implements it
TPU-natively: everything is fixed-shape, mask-based, and jit-compatible —
no data-dependent Python control flow.

Algorithm (Newell et al., NeurIPS'17 "Associative Embedding", greedy
variant): per joint type, take the top-M heatmap peaks (3x3 max-pool NMS);
iterate joint types in order, greedily matching candidates to existing
person groups by |tag - group mean tag| under `tag_threshold`, starting
new groups from unmatched candidates. The official implementation runs
Munkres on CPU per image; here matching is an iterated masked argmin
inside the jit program (M and P are small: the cost matrix is tiny and
the whole decode stays on device, batched via vmap).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = 1e9


class Peaks(NamedTuple):
    coords: jax.Array   # [K, M, 2] (x, y) int32 in heatmap space
    scores: jax.Array   # [K, M] f32, descending per joint


def find_peaks(heatmaps: jax.Array, max_cands: int) -> Peaks:
    """Top-M local maxima per joint. `heatmaps`: [K, H, W] f32.

    A peak is a pixel equal to its 3x3 neighborhood max (ties broken by
    top_k order) — the standard bottom-up heatmap NMS.
    """
    k, h, w = heatmaps.shape
    pooled = jax.lax.reduce_window(
        heatmaps, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    is_peak = heatmaps >= pooled
    flat = jnp.where(is_peak, heatmaps, -_INF).reshape(k, h * w)
    scores, idx = jax.lax.top_k(flat, max_cands)
    coords = jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.int32)
    return Peaks(coords=coords, scores=scores)


def gather_tags(tags: jax.Array, coords: jax.Array) -> jax.Array:
    """Tag values at candidate coords. `tags`: [K, H, W], `coords`:
    [K, M, 2] (x, y) -> [K, M]."""
    k, m = coords.shape[:2]
    joint = jnp.broadcast_to(jnp.arange(k)[:, None], (k, m))
    return tags[joint, coords[..., 1], coords[..., 0]]


class Grouping(NamedTuple):
    keypoints: jax.Array   # [P, K, 2] f32 heatmap-space (x, y)
    scores: jax.Array      # [P, K] f32 (0 where joint missing)
    valid: jax.Array       # [P] bool (group has >= 1 joint)


def _greedy_assign(cost: jax.Array, n_picks: int):
    """Iterated masked argmin over a [P, M] cost matrix.

    Returns (assign_p [M] int32, assigned [M] bool): candidate m -> group
    assign_p[m] where assigned[m]. Each group and candidate used at most
    once; only finite (< _INF/2) costs assign.
    """
    p, m = cost.shape

    def body(_, carry):
        cost, assign_p, assigned = carry
        flat = jnp.argmin(cost)
        pi, mi = flat // m, flat % m
        ok = cost[pi, mi] < _INF / 2
        assign_p = assign_p.at[mi].set(
            jnp.where(ok, pi.astype(jnp.int32), assign_p[mi])
        )
        assigned = assigned.at[mi].set(assigned[mi] | ok)
        row = jnp.arange(p)[:, None] == pi
        col = jnp.arange(m)[None, :] == mi
        cost = jnp.where(ok & (row | col), _INF, cost)
        return cost, assign_p, assigned

    _, assign_p, assigned = jax.lax.fori_loop(
        0, n_picks, body,
        (cost, jnp.zeros((m,), jnp.int32), jnp.zeros((m,), bool)),
    )
    return assign_p, assigned


def group_keypoints(
    peaks: Peaks,
    tag_values: jax.Array,     # [K, M]
    max_people: int,
    score_threshold: float = 0.1,
    tag_threshold: float = 1.0,
    person_score_threshold: float = 0.0,
) -> Grouping:
    """Greedy AE grouping over joint types (fixed shapes, jittable).

    `person_score_threshold`: groups whose mean joint score (over the
    joints actually assigned) is <= this are marked invalid — the
    person-level filter standard HigherHRNet post-processing applies
    after grouping. Without it, ANY stray peak above `score_threshold`
    that matches no existing tag cluster opens a phantom person; a real
    person's mean score sits near the trained peak amplitude (~1)
    while phantom groups built from heatmap noise sit near
    `score_threshold`. Default 0.0 keeps the raw grouping behavior."""
    k, m = tag_values.shape
    p = max_people

    kp = jnp.zeros((p, k, 2), jnp.float32)
    kp_scores = jnp.zeros((p, k), jnp.float32)
    tag_sum = jnp.zeros((p,), jnp.float32)
    tag_cnt = jnp.zeros((p,), jnp.float32)

    for joint in range(k):  # static unroll: K is a model constant
        xy = peaks.coords[joint].astype(jnp.float32)       # [M, 2]
        s = peaks.scores[joint]                            # [M]
        t = tag_values[joint]                              # [M]
        cand_ok = s > score_threshold
        group_ok = tag_cnt > 0
        mean = tag_sum / jnp.maximum(tag_cnt, 1.0)

        cost = jnp.abs(mean[:, None] - t[None, :])
        cost = jnp.where(group_ok[:, None] & cand_ok[None, :]
                         & (cost <= tag_threshold), cost, _INF)
        assign_p, assigned = _greedy_assign(cost, min(p, m))

        # matched candidates join their group
        onehot = (
            jax.nn.one_hot(assign_p, p, dtype=jnp.float32)
            * assigned[:, None]
        )                                                   # [M, P]
        kp = kp.at[:, joint, :].add(onehot.T @ xy)
        kp_scores = kp_scores.at[:, joint].add(onehot.T @ s)
        tag_sum = tag_sum + onehot.T @ t
        tag_cnt = tag_cnt + onehot.sum(axis=0)

        # unmatched valid candidates open new groups in free slots,
        # strongest candidate -> first free slot (top_k order is by score)
        new_c = cand_ok & ~assigned
        free = tag_cnt == 0
        new_rank = jnp.cumsum(new_c) - 1                    # [M]
        free_rank = jnp.cumsum(free) - 1                    # [P]
        match = (
            free[:, None] & new_c[None, :]
            & (free_rank[:, None] == new_rank[None, :])
        ).astype(jnp.float32)                               # [P, M]
        kp = kp.at[:, joint, :].add(match @ xy)
        kp_scores = kp_scores.at[:, joint].add(match @ s)
        tag_sum = tag_sum + match @ t
        tag_cnt = tag_cnt + match.sum(axis=1)

    mean_score = kp_scores.sum(axis=-1) / jnp.maximum(tag_cnt, 1.0)
    return Grouping(
        keypoints=kp,
        scores=kp_scores,
        valid=(tag_cnt > 0) & (mean_score > person_score_threshold),
    )


def decode_bottom_up(
    heatmaps: jax.Array,        # [K, H, W] f32 (aggregated)
    tags: jax.Array,            # [K, H, W] f32 (AE tag maps)
    max_people: int,
    max_cands: int = 8,
    score_threshold: float = 0.1,
    tag_threshold: float = 1.0,
    person_score_threshold: float = 0.0,
) -> Grouping:
    """heatmaps + tags -> grouped multi-person keypoints (one image)."""
    peaks = find_peaks(heatmaps, max_cands)
    tag_values = gather_tags(tags, peaks.coords)
    return group_keypoints(
        peaks, tag_values, max_people, score_threshold, tag_threshold,
        person_score_threshold,
    )
