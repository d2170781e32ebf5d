"""Body-proportion geometry: keypoints -> segment lengths in cm.

The domain core of the reference lives in dict/set Python
(`modules/pose_estimator.py:130-200`): 11 named body segments between
keypoints (plus derived chest/crotch midpoints), visibility filtering via an
ignored-keypoint set, Euclidean pixel distances, and pixel->cm scaling by
``person_height_cm / bbox_pixel_height``.

Here the same geometry is a single linear-algebra pass that vectorizes over
padded person slots and batches: each segment endpoint is a fixed weighted
combination of the 17 keypoints (midpoints = 0.5/0.5 rows), so both
endpoints of all 11 segments come from two constant [11, 17] matrices and
one matmul each. Visibility is a boolean requirement matrix.

Segment naming note: the reference deliberately mirrors left/right (screen
vs. subject perspective, `modules/pose_estimator.py:156-166`) — e.g. the dict
key "lshoulder_lelbow" measures the *r*shoulder->*r*elbow keypoints. The
matrices below encode that mirror exactly.

Known reference bug NOT replicated: when shoulders or hips are gated out,
`_get_kp_dict` references an unbound ``chest``/``crotch`` local and raises
NameError, failing the whole request (`modules/pose_estimator.py:146-166`).
Here those segments simply report not-visible.

Known deliberate divergence (sub-pixel): the reference truncates the
chest/crotch midpoints to integer pixels — ``int(rx + lx) // 2`` per
coordinate (`modules/pose_estimator.py:146-153`) — before measuring the
torso. The default here keeps exact float 0.5/0.5 midpoints (≤0.5 px, i.e.
sub-millimetre at typical scales, and strictly more accurate). Pass
``int_midpoints=True`` to `segment_lengths` for bit-level reference parity.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Keypoint index map, identical to reference IDX_TO_KEYPOINTS
# (`modules/pose_estimator.py:9-17`).
IDX_TO_KEYPOINTS = {
    0: "nose", 1: "reye", 2: "leye",
    3: "rear", 4: "lear",
    5: "rshoulder", 6: "lshoulder",
    7: "relbow", 8: "lelbow",
    9: "rwrist", 10: "lwrist",
    11: "rhip", 12: "lhip",
    13: "rknee", 14: "lknee",
    15: "rankle", 16: "lankle",
}
KEYPOINTS_TO_IDX = {v: k for k, v in IDX_TO_KEYPOINTS.items()}
NUM_KEYPOINTS = 17

# (name, endpoint-1 kp weights, endpoint-2 kp weights) — weights are
# {kp_index: coefficient}. Order matches the reference dict insertion order
# (`modules/pose_estimator.py:156-166`) so serialized responses enumerate
# identically.
_SEGMENT_SPEC = [
    ("shoulder", {5: 1.0}, {6: 1.0}),
    ("torso", {11: 0.5, 12: 0.5}, {5: 0.5, 6: 0.5}),  # crotch -> chest
    ("lshoulder_lelbow", {5: 1.0}, {7: 1.0}),
    ("rshoulder_relbow", {6: 1.0}, {8: 1.0}),
    ("lwrist_lelbow", {9: 1.0}, {7: 1.0}),
    ("rwrist_relbow", {10: 1.0}, {8: 1.0}),
    ("rhip_lhip", {12: 1.0}, {11: 1.0}),
    ("rhip_rknee", {12: 1.0}, {14: 1.0}),
    ("lhip_lknee", {11: 1.0}, {13: 1.0}),
    ("rankle_rknee", {16: 1.0}, {14: 1.0}),
    ("lankle_lknee", {15: 1.0}, {13: 1.0}),
]

SEGMENT_NAMES: List[str] = [s[0] for s in _SEGMENT_SPEC]
NUM_SEGMENTS = len(_SEGMENT_SPEC)

NOT_VISIBLE = "Part not visible"  # reference modules/pose_estimator.py:198


def _build_matrices():
    p1 = np.zeros((NUM_SEGMENTS, NUM_KEYPOINTS), np.float32)
    p2 = np.zeros((NUM_SEGMENTS, NUM_KEYPOINTS), np.float32)
    req = np.zeros((NUM_SEGMENTS, NUM_KEYPOINTS), bool)
    for s, (_, w1, w2) in enumerate(_SEGMENT_SPEC):
        for k, v in w1.items():
            p1[s, k] = v
            req[s, k] = True
        for k, v in w2.items():
            p2[s, k] = v
            req[s, k] = True
    return p1, p2, req


_P1, _P2, _REQUIRED = _build_matrices()


class SegmentLengths(NamedTuple):
    lengths_cm: jax.Array  # [..., NUM_SEGMENTS] float32
    visible: jax.Array     # [..., NUM_SEGMENTS] bool


def segment_lengths(
    keypoints: jax.Array,
    visible: jax.Array,
    pixel_to_cm: jax.Array,
    int_midpoints: bool = False,
) -> SegmentLengths:
    """Compute the 11 body-segment lengths in cm with visibility masks.

    Args:
        keypoints: [..., 17, 2] image-space (x, y).
        visible: [..., 17] bool keypoint visibility (threshold-gated).
        pixel_to_cm: [...] scale = person_height_cm / bbox_pixel_height
            (reference `person_det_pose_edet4_trtserver.py:166-168`).
        int_midpoints: exact reference parity for the torso endpoints —
            chest/crotch midpoints truncated to integer pixels,
            ``int(r + l) // 2`` (`modules/pose_estimator.py:146-153`);
            for non-negative coords that equals ``floor((r + l) / 2)``.
            Default False keeps exact float midpoints (see module docstring).

    Returns:
        lengths_cm [..., 11] and visible [..., 11]; a segment is visible iff
        every required keypoint passed its gate AND the pixel distance is
        > 0 (the reference maps zero distances to "Part not visible" too,
        `modules/pose_estimator.py:198`).
    """
    p1m = jnp.asarray(_P1)
    p2m = jnp.asarray(_P2)
    req = jnp.asarray(_REQUIRED)

    kp = keypoints.astype(jnp.float32)
    e1 = jnp.einsum("sk,...kc->...sc", p1m, kp)
    e2 = jnp.einsum("sk,...kc->...sc", p2m, kp)
    if int_midpoints:
        torso = SEGMENT_NAMES.index("torso")
        crotch = jnp.floor((kp[..., 11, :] + kp[..., 12, :]) / 2.0)
        chest = jnp.floor((kp[..., 5, :] + kp[..., 6, :]) / 2.0)
        e1 = e1.at[..., torso, :].set(crotch)
        e2 = e2.at[..., torso, :].set(chest)
    dist_px = jnp.linalg.norm(e1 - e2, axis=-1)  # [..., 11]

    seg_visible = jnp.all(
        jnp.where(req, visible[..., None, :], True), axis=-1
    )
    seg_visible &= dist_px > 0.0
    lengths_cm = dist_px * pixel_to_cm[..., None]
    return SegmentLengths(
        jnp.where(seg_visible, lengths_cm, 0.0), seg_visible
    )


def to_dist_dict(
    lengths_cm: np.ndarray, visible: np.ndarray
) -> Dict[str, Union[float, str]]:
    """Host-side formatting of one person's segments into the response dict.

    Same contract as `PoseEstimator.get_keypoint_dist_dict`
    (`modules/pose_estimator.py:191-200`): cm value per segment name, or the
    "Part not visible" sentinel string.
    """
    return {
        name: float(lengths_cm[i]) if bool(visible[i]) else NOT_VISIBLE
        for i, name in enumerate(SEGMENT_NAMES)
    }
