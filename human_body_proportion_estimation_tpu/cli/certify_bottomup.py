"""Bottom-up (HigherHRNet + AE grouping) synthetic-supervised
certification: train on multi-person renders, serve, assert cm.

The bottom-up pipeline is capability BEYOND the reference (which reads
only HigherHRNet's "output_2" heatmaps through its top-down path and
discards the AE tags, `pose_est_hrnet_trtserver.py:22-28`), so there is
no reference accuracy contract to inherit; this driver certifies the
same product property `cli/certify.py` certifies for the top-down stack:
served centimeters match analytic truth, end to end.

  1. trains HigherHRNet (W32 trunk) @ 512x512 ON-DEVICE on rendered
     multi-person scenes (1-3 disjoint figures; `training/synthetic.
     generate_multi_scene`) with joint heatmap-MSE (peak-weighted) + AE
     grouping loss (`training/bottomup.py`);
  2. saves/reloads the checkpoint through the serving load path;
  3. direct sweep: `BottomUpPipeline.infer_images` on held-out
     MULTI-person scenes, IoU-matching predicted persons to truth, and
     asserting per-person per-segment cm against the PATH truth (the
     value a perfect model through this decode returns —
     `training/certify_bottomup.bottomup_path_truth_cm`);
  4. HTTP sweep: the full served edge (multipart POST -> batcher ->
     bottom-up jit program) on held-out SINGLE-person scenes (the HTTP
     contract serves the first valid person slot, reference
     server.py:61-67).

Chip run:

    PYTHONPATH=/root/repo:/root/.axon_site python -m \
        human_body_proportion_estimation_tpu.cli.certify_bottomup \
        --workdir /tmp/hbpe_certify_bu --emit-compact

Exit status is non-zero when a gate fails (person coverage, segment
coverage, mean / p95 served-cm error vs path truth).
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time

import numpy as np


def bottomup_direct_sweep(pipeline, scenes) -> dict:
    """infer_images over multi-person scenes; IoU-match persons; cm errors
    vs path truth (and vs raw analytic truth, reported unGated — the
    keypoint-extent pixel->cm convention biases it, see module doc)."""
    from human_body_proportion_estimation_tpu.training.certify_bottomup import (  # noqa: E501
        bottomup_path_truth_cm,
        match_persons_iou,
    )
    from human_body_proportion_estimation_tpu.training.synthetic import (
        SyntheticScene,
        segment_truth_cm,
    )

    errs_path, errs_analytic = [], []
    persons_total = persons_matched = 0
    segs_possible = segs_served = 0
    spurious = 0
    input_hw = type(pipeline).INPUT_HW
    for sc in scenes:
        declared = int(round(float(sc.heights_cm[0])))
        out = pipeline.infer_images([sc.image], person_heights=declared)
        valid = np.asarray(out.person_valid[0], bool)
        boxes = np.asarray(out.boxes_orig[0])
        match = match_persons_iou(boxes, valid, sc.bboxes_xyxy)
        persons_total += sc.keypoints.shape[0]
        spurious += int(valid.sum()) - sum(1 for j in match if j >= 0)
        for t_idx, j in enumerate(match):
            if j < 0:
                continue
            persons_matched += 1
            truth_path, vis_path = bottomup_path_truth_cm(
                sc.keypoints[t_idx], sc.visible[t_idx], declared,
                input_hw, sc.image.shape[:2],
            )
            # raw analytic truth under the top-down scaling rule, for
            # context only (single-person SyntheticScene shim)
            shim = SyntheticScene(
                image=sc.image, keypoints=sc.keypoints[t_idx],
                visible=sc.visible[t_idx],
                bbox_xyxy=sc.bboxes_xyxy[t_idx],
                height_cm=float(sc.heights_cm[t_idx]),
            )
            truth_a, vis_a = segment_truth_cm(shim)
            scale_a = declared / float(sc.heights_cm[t_idx])
            served = np.asarray(out.lengths_cm[0][j])
            served_vis = np.asarray(out.seg_visible[0][j], bool)
            for s in range(11):
                if not vis_path[s]:
                    continue
                segs_possible += 1
                if not served_vis[s]:
                    continue
                segs_served += 1
                errs_path.append(abs(served[s] - truth_path[s]))
                if vis_a[s]:
                    errs_analytic.append(
                        abs(served[s] - truth_a[s] * scale_a)
                    )
    ep = np.asarray(errs_path, np.float64)
    ea = np.asarray(errs_analytic, np.float64)
    return {
        "scenes": len(scenes),
        "persons_total": persons_total,
        "persons_matched": persons_matched,
        "spurious_persons": spurious,
        "segments_possible": segs_possible,
        "segments_served": segs_served,
        "mean_abs_cm_err_vs_path": (
            float(ep.mean()) if ep.size else float("inf")),
        "median_abs_cm_err_vs_path": (
            float(np.median(ep)) if ep.size else float("inf")),
        "p95_abs_cm_err_vs_path": (
            float(np.percentile(ep, 95)) if ep.size else float("inf")),
        "max_abs_cm_err_vs_path": (
            float(ep.max()) if ep.size else float("inf")),
        "mean_abs_cm_err_vs_analytic": (
            float(ea.mean()) if ea.size else float("inf")),
    }


def bottomup_http_sweep(pipeline, scenes) -> dict:
    """Full HTTP edge on single-person scenes (first-valid-slot response
    contract); cm vs path truth."""
    import cv2

    from human_body_proportion_estimation_tpu.cli.certify import (
        _post_scene,
    )
    from human_body_proportion_estimation_tpu.ops.proportions import (
        NOT_VISIBLE,
        SEGMENT_NAMES,
    )
    from human_body_proportion_estimation_tpu.serve.server import (
        ServingApp,
        create_server,
    )
    from human_body_proportion_estimation_tpu.training.certify_bottomup import (  # noqa: E501
        bottomup_path_truth_cm,
    )

    app = ServingApp(pipeline)
    server = create_server(app, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    errs, latencies = [], []
    n_detected = segs_possible = segs_served = 0
    input_hw = type(pipeline).INPUT_HW
    try:
        for sc in scenes:
            ok, png = cv2.imencode(".png", sc.image[..., ::-1])
            assert ok
            declared = int(round(float(sc.heights_cm[0])))
            t0 = time.perf_counter()
            data = _post_scene(port, png.tobytes(), declared, 0.0)
            latencies.append(time.perf_counter() - t0)
            if data.get("code") != "success":
                continue
            served = data["body_proportion_lengths_(cm)"]
            if not served:
                continue
            n_detected += 1
            truth, vis = bottomup_path_truth_cm(
                sc.keypoints[0], sc.visible[0], declared,
                input_hw, sc.image.shape[:2],
            )
            for i, name in enumerate(SEGMENT_NAMES):
                if not vis[i]:
                    continue
                segs_possible += 1
                v = served.get(name)
                if v is None or v == NOT_VISIBLE:
                    continue
                segs_served += 1
                errs.append(abs(v - truth[i]))
    finally:
        server.shutdown()
        app.shutdown()
    e = np.asarray(errs, np.float64)
    return {
        "scenes": len(scenes),
        "detected": n_detected,
        "segments_possible": segs_possible,
        "segments_served": segs_served,
        "mean_abs_cm_err_vs_path": (
            float(e.mean()) if e.size else float("inf")),
        "p95_abs_cm_err_vs_path": (
            float(np.percentile(e, 95)) if e.size else float("inf")),
        "mean_http_latency_s": float(np.mean(latencies)),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="bottom-up train-on-synthetic -> serve -> assert cm"
    )
    parser.add_argument("--workdir", default="/tmp/hbpe_certify_bu")
    parser.add_argument("--train-scenes", type=int, default=480)
    parser.add_argument("--val-scenes", type=int, default=16,
                        help="held-out MULTI-person scenes (direct sweep)")
    parser.add_argument("--http-scenes", type=int, default=8,
                        help="held-out SINGLE-person scenes (HTTP sweep)")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--ae-weight", type=float, default=1e-3)
    parser.add_argument("--fg-weight", type=float, default=12.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tolerance-cm", type=float, default=4.0)
    parser.add_argument("--max-people", type=int, default=3)
    parser.add_argument("--reuse-checkpoint", action="store_true")
    parser.add_argument("--smoke", action="store_true",
                        help="CPU wiring check: tiny HigherHRNet, 128x128 "
                             "marker scenes (minutes, no chip)")
    parser.add_argument(
        "--emit-compact", nargs="?", const="default", default="",
        metavar="PATH",
        help="on a CERTIFIED run, write the compact committable .npz "
             "(models/weights.save_compact_checkpoint, pose slot only) — "
             "bare --emit-compact writes models.weights."
             "default_certified_bottomup_checkpoint(), the file "
             "`serve.server --bottom-up` loads by default",
    )
    parser.add_argument("--compile-cache-dir", default="")
    parser.add_argument("--no-compile-cache", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        from human_body_proportion_estimation_tpu.utils import compile_cache

        compile_cache.enable(args.compile_cache_dir or None)

    from human_body_proportion_estimation_tpu.models import weights
    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNet,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import (
        HRNetConfig,
    )
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )
    from human_body_proportion_estimation_tpu.training import (
        certify_bottomup as CB,
    )

    t_start = time.time()
    os.makedirs(args.workdir, exist_ok=True)
    ckpt_dir = os.path.join(args.workdir, "ckpt")

    def log(msg):
        print(f"[certify-bu +{time.time() - t_start:7.1f}s] {msg}",
              flush=True)

    if args.smoke:
        input_hw = (128, 128)
        model = HigherHRNet(config=HRNetConfig(
            width=16, stage_modules=(1, 1, 1), blocks_per_branch=2,
            stem_channels=16, bottleneck_channels=16,
        ), num_deconv_blocks=1)
        scene_kwargs = dict(fixed_pose=True, keypoint_markers=True)
        args.train_scenes = min(args.train_scenes, 48)
        args.val_scenes = min(args.val_scenes, 4)
        args.http_scenes = min(args.http_scenes, 2)
        args.steps = min(args.steps, 500)
        args.batch = min(args.batch, 8)
        args.lr = 2e-3
        args.tolerance_cm = max(args.tolerance_cm, 10.0)
    else:
        input_hw = BottomUpPipeline.INPUT_HW
        model = HigherHRNet()
        scene_kwargs = {}

    class _Pipe(BottomUpPipeline):
        INPUT_HW = input_hw

    report: dict = {
        "mode": "smoke" if args.smoke else "chip",
        "platform": jax.devices()[0].platform,
        "input_hw": list(input_hw),
        "max_people": args.max_people,
    }

    log(f"rendering {args.train_scenes} train / {args.val_scenes} val "
        f"multi-person scenes at {input_hw}")
    train_scenes = CB.make_multi_scenes(
        args.train_scenes, args.seed, input_hw,
        max_people=args.max_people, **scene_kwargs,
    )
    val_scenes = CB.make_multi_scenes(
        args.val_scenes, args.seed + 10_000, input_hw,
        max_people=args.max_people, **scene_kwargs,
    )
    http_scenes = CB.make_multi_scenes(
        args.http_scenes, args.seed + 20_000, input_hw, n_people=1,
        **scene_kwargs,
    )

    if args.reuse_checkpoint:
        log(f"reusing checkpoint {ckpt_dir}")
    else:
        imgs, kp, vis = CB.bottomup_arrays(train_scenes, args.max_people)
        log(f"dataset {imgs.shape} ({imgs.nbytes / 1e6:.0f} MB "
            f"device-resident); training {args.steps} steps @ batch "
            f"{args.batch}")
        pose_vars, losses = CB.train_bottomup_resident(
            model, imgs, kp, vis,
            steps=args.steps, batch=args.batch, learning_rate=args.lr,
            seed=args.seed, chunk=100, ae_weight=args.ae_weight,
            fg_weight=args.fg_weight,
            log_fn=lambda s, z: log(f"  step {s}: loss {z:.5f}"),
        )
        report["loss_first"] = losses[0]
        report["loss_last"] = losses[-1]
        weights.save_pose_checkpoint(ckpt_dir, pose_vars)
        log(f"checkpoint saved to {ckpt_dir}")

    pose_r = weights.load_pose_checkpoint(ckpt_dir)
    pipeline = _Pipe(pose_vars=pose_r, max_people=args.max_people,
                     model=model)

    log("direct sweep (multi-person, IoU-matched)")
    report["direct"] = bottomup_direct_sweep(pipeline, val_scenes)
    log(f"direct: {report['direct']}")

    log("HTTP sweep (single-person, full served edge)")
    report["http"] = bottomup_http_sweep(pipeline, http_scenes)
    log(f"http: {report['http']}")

    d = report["direct"]
    gates = {
        "person_coverage": (
            d["persons_matched"] >= 0.9 * max(d["persons_total"], 1)),
        "no_spurious_flood": (
            d["spurious_persons"] <= 0.2 * max(d["persons_total"], 1)),
        "segment_coverage": (
            d["segments_served"]
            >= 0.85 * max(d["segments_possible"], 1)),
        "mean_cm_err": (
            d["mean_abs_cm_err_vs_path"] <= args.tolerance_cm),
        "p95_cm_err": (
            d["p95_abs_cm_err_vs_path"] <= 2.0 * args.tolerance_cm),
        "http_detected": (
            report["http"]["detected"]
            >= 0.9 * report["http"]["scenes"]),
    }
    report["gates"] = gates
    report["certified"] = all(gates.values())
    report["wall_s"] = time.time() - t_start

    if args.emit_compact and report["certified"]:
        compact_path = (
            weights.default_certified_bottomup_checkpoint()
            if args.emit_compact == "default" else args.emit_compact
        )
        weights.save_compact_checkpoint(compact_path, {}, pose_r)
        report["compact_checkpoint"] = compact_path
        log(f"compact certified checkpoint written to {compact_path} "
            f"({os.path.getsize(compact_path) / 1e6:.1f} MB)")
    elif args.emit_compact:
        log("certification FAILED — compact checkpoint NOT written")

    with open(os.path.join(args.workdir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0 if report["certified"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
