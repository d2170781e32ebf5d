"""Bottom-up (HigherHRNet + AE grouping) synthetic certification:
multi-person dataset builders, a resident-dataset training loop, and the
serving-path analytic truth.

The bottom-up pipeline is capability BEYOND the reference (it reads only
the "output_2" heatmaps through its top-down path and discards the AE
tags, `pose_est_hrnet_trtserver.py:22-28`); its certification therefore
asserts against the PATH truth — the cm values a perfect model pushed
through `pipeline/bottomup.py`'s exact decode would return:

  * keypoints quantize to the aggregated-heatmap grid (1/2 input res —
    `find_peaks` argmax bins, ops/ae_grouping.py);
  * pixel->cm scale is declared_height / VISIBLE-KEYPOINT vertical
    extent (bottom-up has no detector box; bottomup.py:200-217 uses the
    keypoint bbox where the reference's top-down path uses the detector
    box, `person_det_pose_edet4_trtserver.py:166-168`). That extent
    (ankle..eye line) is systematically shorter than the drawn figure
    height, so raw analytic segment truth is reported alongside but the
    gates bind on path truth — certifying the implementation, not the
    height-extent convention.

Training mirrors `training/certify.py`'s TPU-native pattern: the whole
multi-person dataset is device-resident uint8 and each jitted call
advances `chunk` optimizer steps in a `lax.fori_loop`, so the axon tunnel
carries only tiny index arrays per call.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.training.synthetic import (
    MultiPersonScene,
    generate_multi_scene,
)


def make_multi_scenes(
    n: int,
    seed: int,
    img_hw: Tuple[int, int] = (512, 512),
    n_people: int | None = None,
    max_people: int = 3,
    shared_height: bool = True,
    **scene_kwargs,
) -> List[MultiPersonScene]:
    """`shared_height=True` draws ONE height per scene and renders every
    figure at it — matching the HTTP edge's one-height-per-request form
    contract (the serving path applies the declared height to every
    person slot, pipeline/bottomup.py heights[i, :])."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        h = float(rng.uniform(150.0, 200.0)) if shared_height else None
        out.append(generate_multi_scene(
            rng, img_hw, n_people=n_people, max_people=max_people,
            height_cm=h, **scene_kwargs,
        ))
    return out


# ---------------------------------------------------------------------- #
# dataset builder


def bottomup_arrays(
    scenes: Sequence[MultiPersonScene],
    max_people: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scenes -> (images u8 [N,H,W,3], kp f32 [N,P,17,2] image px,
    vis bool [N,P,17]); person slots padded to `max_people`."""
    n = len(scenes)
    h, w = scenes[0].image.shape[:2]
    imgs = np.zeros((n, h, w, 3), np.uint8)
    kp = np.zeros((n, max_people, 17, 2), np.float32)
    vis = np.zeros((n, max_people, 17), bool)
    for i, sc in enumerate(scenes):
        assert sc.image.shape[:2] == (h, w)
        p = min(sc.keypoints.shape[0], max_people)
        imgs[i] = sc.image
        kp[i, :p] = sc.keypoints[:p]
        vis[i, :p] = sc.visible[:p]
    return imgs, kp, vis


# ---------------------------------------------------------------------- #
# resident-dataset on-device training


def train_bottomup_resident(
    model,
    images_u8: np.ndarray,   # [N, H, W, 3]
    kp: np.ndarray,          # [N, P, 17, 2] image px
    vis: np.ndarray,         # [N, P, 17] bool
    steps: int,
    batch: int,
    learning_rate: float = 1e-3,
    seed: int = 0,
    chunk: int = 50,
    ae_weight: float = 1e-3,
    fg_weight: float = 12.0,
    log_fn=None,
) -> Tuple[dict, List[float]]:
    """Train HigherHRNet with the whole multi-person dataset
    device-resident; returns (pose_vars, per-chunk mean losses). Constant
    Adam LR — the round-4 chip measurement (training/certify.py
    train_pose_resident) showed warmup+cosine regressing 5x at these
    step budgets."""
    from human_body_proportion_estimation_tpu.training import (
        bottomup as BU,
        trainer as T,
    )

    n, h, w = images_u8.shape[0], images_u8.shape[1], images_u8.shape[2]
    state, tx = T.create_train_state(
        model, jax.random.PRNGKey(seed), (1, h, w, 3), learning_rate
    )
    d_imgs = jax.device_put(images_u8)
    d_kp = jax.device_put(kp.astype(np.float32))
    d_vis = jax.device_put(vis)

    # dataset arrays as jit ARGUMENTS (not closure constants): a captured
    # device array lowers as an HLO constant and inflates/413-kills the
    # axon remote-compile request (see training/certify.py)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(st, idx, d_imgs, d_kp, d_vis):
        def body(i, carry):
            st, loss_sum = carry
            sel = idx[i]
            imgs = d_imgs[sel].astype(jnp.float32) / 255.0
            st, loss = BU.bottomup_train_step(
                model, tx, st, imgs, d_kp[sel], d_vis[sel],
                ae_weight=ae_weight, fg_weight=fg_weight,
            )
            return st, loss_sum + loss

        st, loss_sum = jax.lax.fori_loop(
            0, idx.shape[0], body, (st, jnp.zeros((), jnp.float32))
        )
        return st, loss_sum / idx.shape[0]

    rng = np.random.default_rng(seed + 1)
    losses: List[float] = []
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        idx = rng.integers(0, n, (k, batch)).astype(np.int32)
        state, mean_loss = run_chunk(state, jnp.asarray(idx),
                                     d_imgs, d_kp, d_vis)
        losses.append(float(jax.device_get(mean_loss)))
        done += k
        if log_fn:
            log_fn(done, losses[-1])
    pose_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    return pose_vars, losses


# ---------------------------------------------------------------------- #
# serving-path analytic truth


def bottomup_path_truth_cm(
    kp_img: np.ndarray,        # [17, 2] true keypoints, image px
    visible: np.ndarray,       # [17] bool
    declared_height_cm: float,
    input_hw: Tuple[int, int],   # pipeline INPUT_HW (512, 512)
    orig_hw: Tuple[int, int],    # posted image size
) -> Tuple[np.ndarray, np.ndarray]:
    """The 11 segment cm values a PERFECT model through the bottom-up
    decode returns for one person: keypoints snapped to the aggregated
    heatmap's integer grid (1/2 the pipeline input res), remapped to
    original coords, scaled by declared_height / visible-keypoint
    y-extent — `pipeline/bottomup.py` forward() line by line, in numpy."""
    from human_body_proportion_estimation_tpu.ops.proportions import (
        _P1, _P2,
    )

    hm_h, hm_w = input_hw[0] // 2, input_hw[1] // 2
    oh, ow = float(orig_hw[0]), float(orig_hw[1])
    # original px -> heatmap bins (the model sees the image resized to
    # input_hw; heatmaps are 1/2 that; forward() scales peaks back by
    # orig_hw / hm_hw)
    sx, sy = ow / hm_w, oh / hm_h
    kx = np.clip(np.round(kp_img[:, 0] / sx), 0, hm_w - 1)
    ky = np.clip(np.round(kp_img[:, 1] / sy), 0, hm_h - 1)
    kq = np.stack([kx * sx, ky * sy], axis=-1)      # back to original px

    vis = visible.astype(bool)
    ys = kq[vis, 1]
    pixel_height = max(float(ys.max() - ys.min()), 1.0)
    pixel_to_cm = declared_height_cm / pixel_height

    e1 = _P1 @ kq
    e2 = _P2 @ kq
    dist_px = np.linalg.norm(e1 - e2, axis=-1)
    seg_vis = ((np.abs(_P1) @ vis.astype(np.float64) > 0)
               & (np.abs(_P2) @ vis.astype(np.float64) > 0)
               & (dist_px > 0))
    return (dist_px * pixel_to_cm).astype(np.float32), seg_vis


def match_persons_iou(
    pred_boxes: np.ndarray,   # [P, 4] yxyx
    pred_valid: np.ndarray,   # [P] bool
    true_boxes: np.ndarray,   # [T, 4] xyxy
) -> List[int]:
    """Greedy IoU matching: for each true person, the best unused valid
    predicted slot (index) or -1. Boxes come in the two conventions the
    two sides emit (pipeline yxyx vs scene xyxy)."""
    t = true_boxes.shape[0]
    used: set = set()
    out = []
    for i in range(t):
        x1, y1, x2, y2 = [float(v) for v in true_boxes[i]]
        best_j, best_iou = -1, 0.0
        for j in range(pred_boxes.shape[0]):
            if j in used or not pred_valid[j]:
                continue
            by1, bx1, by2, bx2 = [float(v) for v in pred_boxes[j]]
            ix = max(0.0, min(bx2, x2) - max(bx1, x1))
            iy = max(0.0, min(by2, y2) - max(by1, y1))
            inter = ix * iy
            union = ((bx2 - bx1) * (by2 - by1)
                     + (x2 - x1) * (y2 - y1) - inter)
            iou = inter / max(union, 1e-6)
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_iou > 0.1:
            used.add(best_j)
            out.append(best_j)
        else:
            out.append(-1)
    return out
