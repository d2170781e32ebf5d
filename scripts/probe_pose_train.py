"""Chip probe: pose-only training quality + serving-gate coverage.

The r4 certify chip run's pose side regressed under warmup+cosine
(val 25.3 hm-px mean vs 5.3 at constant LR in r03) and even the good
r03 pose served only 55% of segments through the reference's
per-keypoint confidence gates (utils/config.PoseConfig
.keypoint_thresholds, reference person_det_pose_edet4_trtserver.py
:162-163). This probe iterates the pose recipe without paying for
detector training or the HTTP sweep: render scenes, train HRNet-W32,
then report

  - held-out argmax keypoint error (mean/p95/max, heatmap px),
  - per-keypoint peak-score quantiles vs the serving thresholds,
  - the gate pass-rate per keypoint and the implied 11-segment
    coverage (the certify gate needs >= 85%).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pose_train.py \
        [--scenes 640] [--steps 4000] [--batch 16] [--lr 1e-3] \
        [--cosine] [--sigma 2.0] [--val-scenes 48]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=640)
    ap.add_argument("--val-scenes", type=int, default=48)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cosine", action="store_true")
    ap.add_argument("--sigma", type=float, default=2.0)
    ap.add_argument("--fg-weight", type=float, default=0.0)
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--box-jitter", type=float, default=0.08)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default="",
                    help="save the trained pose vars (orbax dir)")
    args = ap.parse_args()

    from human_body_proportion_estimation_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.hrnet import (
        create_hrnet,
    )
    from human_body_proportion_estimation_tpu.ops import heatmap as hm_ops
    from human_body_proportion_estimation_tpu.ops.proportions import (
        _REQUIRED,
        SEGMENT_NAMES,
    )
    from human_body_proportion_estimation_tpu.training import certify as C
    from human_body_proportion_estimation_tpu.training.synthetic import (
        generate_scene,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        PipelineConfig,
    )

    t0 = time.time()

    def log(msg):
        print(f"[probe +{time.time() - t0:6.1f}s] {msg}", flush=True)

    cfg = PipelineConfig()
    img_hw = (cfg.detector.input_height, cfg.detector.input_width)

    rng = np.random.default_rng(args.seed)
    log(f"rendering {args.scenes} train / {args.val_scenes} val scenes")
    train_scenes = [generate_scene(rng, img_hw)
                    for _ in range(args.scenes)]
    val_rng = np.random.default_rng(args.seed + 10_000)
    val_scenes = [generate_scene(val_rng, img_hw)
                  for _ in range(args.val_scenes)]

    crops, kp_hm, vis, _ = C.pose_crop_arrays(
        train_scenes, cfg, seed=args.seed + 1, box_jitter=args.box_jitter
    )
    log(f"pose dataset {crops.shape} ({crops.nbytes / 1e6:.0f} MB)")

    model = create_hrnet("hrnet_w32")
    pose_vars, losses = C.train_pose_resident(
        model, crops, kp_hm, vis,
        steps=args.steps, batch=args.batch, learning_rate=args.lr,
        seed=args.seed, chunk=100, sigma=args.sigma,
        log_fn=lambda s, z: log(f"  pose step {s}: loss {z:.5f}"),
        cosine=args.cosine, fg_weight=args.fg_weight,
    )
    log(f"loss first={losses[0]:.4f} last={losses[-1]:.5f}")
    if args.calibrate:
        cal = C.pose_peak_scores(model, pose_vars, crops[:256])
        pose_vars, gamma = C.calibrate_pose_gates(
            pose_vars, cal, vis[:256], cfg.pose.keypoint_thresholds
        )
        log(f"gate calibration gamma: {np.round(gamma, 3).tolist()}")
    if args.save:
        from human_body_proportion_estimation_tpu.models import weights

        weights.save_pose_checkpoint(args.save, pose_vars)
        log(f"pose checkpoint saved to {args.save}")

    # ---- held-out quality + serving-gate analysis (tight boxes) ----
    vcrops, vkp, vvis, _ = C.pose_crop_arrays(val_scenes, cfg, seed=99,
                                              box_jitter=0.0)

    @jax.jit
    def decode(imgs_u8):
        hm = model.apply(pose_vars, imgs_u8.astype(jnp.float32) / 255.0)
        hm = jnp.moveaxis(hm, -1, 1)
        return hm_ops.decode_heatmaps(hm)

    errs, scores = [], []
    for s in range(0, len(vcrops), 8):
        d = decode(jnp.asarray(vcrops[s:s + 8]))
        xy = np.asarray(d.keypoints)
        errs.append(np.linalg.norm(xy - vkp[s:s + 8], axis=-1))
        scores.append(np.asarray(d.scores))
    err = np.concatenate(errs)        # [N,17]
    score = np.concatenate(scores)    # [N,17]
    e_vis = err[vvis]
    log(f"val kp err (hm px): mean {e_vis.mean():.2f} "
        f"p95 {np.percentile(e_vis, 95):.2f} max {e_vis.max():.2f}")

    thr = np.asarray(cfg.pose.keypoint_thresholds)
    passed = score >= thr             # [N,17]
    kp_cov = passed[vvis].mean()
    # segment coverage: every required keypoint must pass its gate
    seg_pass = []
    for srow in _REQUIRED:
        need = np.where(srow)[0]
        seg_pass.append(passed[:, need].all(axis=1))
    seg_pass = np.stack(seg_pass, 1)  # [N,11]
    seg_cov = seg_pass.mean()
    log(f"gate pass-rate: keypoints {kp_cov:.3f}, segments {seg_cov:.3f} "
        f"(certify gate needs >= 0.85)")
    per_kp = {
        i: {
            "thr": float(thr[i]),
            "p05_score": float(np.percentile(score[:, i], 5)),
            "p50_score": float(np.percentile(score[:, i], 50)),
            "pass": float(passed[:, i].mean()),
            "mean_err": float(err[vvis[:, i], i].mean()
                              if vvis[:, i].any() else -1),
        }
        for i in range(17)
    }
    for i, st in per_kp.items():
        log(f"  kp{i:2d} thr {st['thr']:.2f} score p05 "
            f"{st['p05_score']:.3f} p50 {st['p50_score']:.3f} "
            f"pass {st['pass']:.2f} err {st['mean_err']:.2f}")
    per_seg = {SEGMENT_NAMES[i]: float(seg_pass[:, i].mean())
               for i in range(len(SEGMENT_NAMES))}
    log(f"per-segment gate coverage: {per_seg}")

    out = {
        "val_kp_err_mean": float(e_vis.mean()),
        "val_kp_err_p95": float(np.percentile(e_vis, 95)),
        "val_kp_err_max": float(e_vis.max()),
        "kp_gate_pass": float(kp_cov),
        "segment_gate_coverage": float(seg_cov),
        "per_segment": per_seg,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "wall_s": time.time() - t0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
