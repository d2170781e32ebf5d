"""Production-shape synthetic-supervised end-to-end certification.

The reference's accuracy fixtures are height-encoded photos
(`/root/reference/media/imgs/dave_bautista_193.jpg`, `zack_snyder_170.jpg`)
usable only with its downloadable pretrained weights — unobtainable in a
zero-egress sandbox. This CLI certifies the same product property the
reference's way cannot be tested here, at FULL serving shapes on the real
chip:

  1. trains HRNet-W32 @ 384x288 (pose) and EfficientDet-Lite0 @ 480x640
     (person detection) ON-DEVICE on rendered scenes whose keypoints, tight
     person box, and true segment lengths in cm are analytic
     (`training/synthetic.py`);
  2. saves an orbax pipeline checkpoint (`models/weights.py`) and reloads
     it — the exact `serve.server --checkpoint-dir` load path;
  3. drives the FULL served stack (multipart HTTP POST -> dynamic batcher
     -> fused jit program -> detect -> crop -> pose -> decode -> remap ->
     pixel->cm) with HELD-OUT renders and asserts every returned cm
     segment against analytic truth (reference cm contract
     `modules/pose_estimator.py:191-200`, driver
     `person_det_pose_edet4_trtserver.py:148-171`);
  4. fills the accuracy table (person-box mAP / OKS-AP / PCK) over a
     synthetic-COCO val set via `cli/evaluate.run_eval` — the numbers
     BASELINE.md marks "not published" for the reference;
  5. additionally sweeps the REAL-weight SSD detector (the reference's
     checked-in ssd.tflite) paired with the trained pose model, reported
     but not gated (SSD was never trained on these renders — its box-height
     error bounds the cm scale there).

The reduced-shape, always-on CPU twin of this run lives in
`tests/test_synthetic_certification.py`; `--smoke` here exercises this
driver end to end on CPU in minutes (tiny models, marker scenes).

Chip run (records its report under --workdir; paste into BENCHMARKS.md):

    PYTHONPATH=/root/repo:/root/.axon_site python -m \
        human_body_proportion_estimation_tpu.cli.certify \
        --workdir /tmp/hbpe_certify

Exit status is non-zero when a gate fails (detection coverage, mean /
p95 served-cm error vs analytic truth).
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import threading
import time
import uuid

import numpy as np


# --------------------------------------------------------------------- #
# HTTP plumbing (stdlib client, mirroring the reference's curl contract)


def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    for name, (data, filename) in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        out.write(disp.encode() + b"\r\n\r\n")
        out.write(data if isinstance(data, bytes) else str(data).encode())
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def _post_scene(port: int, png: bytes, height_cm: int,
                threshold: float) -> dict:
    body, ctype = _multipart({
        "file": (png, "scene.png"),
        "person_height_in_cm": (str(int(height_cm)), None),
        "threshold": (f"{threshold}", None),
    })
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=1800)
    try:
        conn.request("POST", "/body_proportion_length_estimation_file",
                     body=body, headers={"Content-Type": ctype})
        resp = conn.getresponse()
        return json.loads(resp.read())
    finally:
        conn.close()


# --------------------------------------------------------------------- #
# synthetic-COCO val set writer (consumed by cli/evaluate.run_eval)


def write_coco_valset(scenes, out_dir: str) -> tuple[str, str]:
    """Render a COCO-format person-keypoints val set from scenes.

    Returns (annotations_json_path, images_dir). v=2 (visible) for every
    keypoint — the renderer draws frontal standing figures with no
    occlusion."""
    import cv2

    images_dir = os.path.join(out_dir, "images")
    os.makedirs(images_dir, exist_ok=True)
    images, annotations = [], []
    for i, sc in enumerate(scenes):
        fname = f"scene_{i:04d}.png"
        cv2.imwrite(os.path.join(images_dir, fname), sc.image[..., ::-1])
        h, w = sc.image.shape[:2]
        images.append({"id": i, "file_name": fname,
                       "height": h, "width": w})
        x1, y1, x2, y2 = [float(v) for v in sc.bbox_xyxy]
        kps = []
        for k in range(17):
            kps += [float(sc.keypoints[k, 0]), float(sc.keypoints[k, 1]),
                    2 if sc.visible[k] else 0]
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "bbox": [x1, y1, x2 - x1, y2 - y1],
            "area": (x2 - x1) * (y2 - y1),
            "keypoints": kps, "num_keypoints": int(sc.visible.sum()),
            "iscrowd": 0,
        })
    ann_path = os.path.join(out_dir, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }, f)
    return ann_path, images_dir


# --------------------------------------------------------------------- #
# sweeps


def detector_val_report(pipeline, scenes, det_threshold: float) -> dict:
    """Direct (pre-HTTP) detector quality on held-out scenes: coverage,
    IoU, and the relative box-HEIGHT error that bounds the cm scale
    (pixel->cm = declared_height / detected box height, reference driver
    :166-168)."""
    ious, herrs, scores, miss = [], [], [], 0
    for sc in scenes:
        out = pipeline.infer_images([sc.image],
                                    det_threshold=det_threshold)
        valid = np.asarray(out.person_valid[0], bool)
        if not valid.any():
            miss += 1
            continue
        j = int(np.argmax(np.where(valid, np.asarray(out.det_scores[0]),
                                   -1.0)))
        by1, bx1, by2, bx2 = np.asarray(out.boxes_orig[0][j], np.float64)
        # undo the serving x-expand (w//17 each side) to compare against
        # the tight analytic box
        bx1 += pipeline.config.x_expand
        bx2 -= pipeline.config.x_expand
        x1, y1, x2, y2 = sc.bbox_xyxy.astype(np.float64)
        ix = max(0.0, min(bx2, x2) - max(bx1, x1))
        iy = max(0.0, min(by2, y2) - max(by1, y1))
        inter = ix * iy
        union = ((bx2 - bx1) * (by2 - by1) + (x2 - x1) * (y2 - y1)
                 - inter)
        ious.append(inter / max(union, 1e-6))
        herrs.append(((by2 - by1) - (y2 - y1)) / (y2 - y1))
        scores.append(float(out.det_scores[0][j]))
    return {
        "scenes": len(scenes),
        "missed": miss,
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "median_abs_rel_height_err": (
            float(np.median(np.abs(herrs))) if herrs else 1.0),
        "max_abs_rel_height_err": (
            float(np.max(np.abs(herrs))) if herrs else 1.0),
        "mean_score": float(np.mean(scores)) if scores else 0.0,
    }


def serve_sweep(pipeline, scenes, det_threshold: float) -> dict:
    """Drive the full HTTP stack against held-out scenes; compare every
    served cm segment to analytic truth (scaled to the declared integer
    height) and to the argmax-quantized truth."""
    import cv2

    from human_body_proportion_estimation_tpu.ops.proportions import (
        NOT_VISIBLE,
        SEGMENT_NAMES,
    )
    from human_body_proportion_estimation_tpu.serve.server import (
        ServingApp,
        create_server,
    )
    from human_body_proportion_estimation_tpu.training.certify import (
        quantized_truth_cm,
    )
    from human_body_proportion_estimation_tpu.training.synthetic import (
        segment_truth_cm,
    )

    app = ServingApp(pipeline)
    server = create_server(app, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    errs_analytic, errs_quant = [], []
    per_segment: dict[str, list] = {n: [] for n in SEGMENT_NAMES}
    latencies = []
    n_detected = 0
    segs_served = 0
    segs_possible = 0
    try:
        for sc in scenes:
            ok, png = cv2.imencode(".png", sc.image[..., ::-1])
            assert ok
            declared = int(round(sc.height_cm))
            scale = declared / sc.height_cm
            t0 = time.perf_counter()
            data = _post_scene(port, png.tobytes(), declared,
                               det_threshold)
            latencies.append(time.perf_counter() - t0)
            truth, t_vis = segment_truth_cm(sc)
            q_truth, q_vis = quantized_truth_cm(sc, pipeline.config)
            if data.get("code") != "success":
                continue
            served = data["body_proportion_lengths_(cm)"]
            n_detected += 1
            for i, name in enumerate(SEGMENT_NAMES):
                if not (t_vis[i] and q_vis[i]):
                    continue
                segs_possible += 1
                v = served.get(name)
                if v is None or v == NOT_VISIBLE:
                    continue
                segs_served += 1
                ea = abs(v - truth[i] * scale)
                eq = abs(v - q_truth[i] * scale)
                errs_analytic.append(ea)
                errs_quant.append(eq)
                per_segment[name].append(ea)
    finally:
        server.shutdown()
        app.shutdown()
    ea = np.asarray(errs_analytic, np.float64)
    return {
        "scenes": len(scenes),
        "detected": n_detected,
        "segments_served": segs_served,
        "segments_possible": segs_possible,
        "mean_abs_cm_err": float(ea.mean()) if ea.size else float("inf"),
        "median_abs_cm_err": (float(np.median(ea)) if ea.size
                              else float("inf")),
        "p95_abs_cm_err": (float(np.percentile(ea, 95)) if ea.size
                           else float("inf")),
        "max_abs_cm_err": float(ea.max()) if ea.size else float("inf"),
        "mean_abs_cm_err_vs_quantized": (
            float(np.mean(errs_quant)) if errs_quant else float("inf")),
        "per_segment_mean_cm_err": {
            n: float(np.mean(v)) for n, v in per_segment.items() if v
        },
        "mean_http_latency_s": float(np.mean(latencies)),
    }


def pose_val_report(model, pose_vars, scenes, cfg) -> dict:
    """Direct pose quality on held-out crops (tight boxes, no jitter):
    mean/max keypoint error in heatmap px after argmax decode."""
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.ops.heatmap import (
        decode_heatmaps,
    )
    from human_body_proportion_estimation_tpu.training.certify import (
        pose_crop_arrays,
    )

    crops, kp_hm, vis, _ = pose_crop_arrays(scenes, cfg, seed=99,
                                            box_jitter=0.0)

    @jax.jit
    def decode(imgs_u8):
        hm = model.apply(pose_vars, imgs_u8.astype(jnp.float32) / 255.0)
        hm = jnp.moveaxis(hm, -1, 1)  # NHWC -> NKHW for the decoder
        return decode_heatmaps(hm)

    errs = []
    for s in range(0, len(crops), 8):
        d = decode(jnp.asarray(crops[s:s + 8]))
        xy = np.asarray(d.keypoints)
        e = np.linalg.norm(xy - kp_hm[s:s + 8], axis=-1)[vis[s:s + 8]]
        errs.append(e)
    e = np.concatenate(errs)
    return {
        "crops": len(crops),
        "mean_kp_err_hm_px": float(e.mean()),
        "p95_kp_err_hm_px": float(np.percentile(e, 95)),
        "max_kp_err_hm_px": float(e.max()),
    }


# --------------------------------------------------------------------- #


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="train-on-synthetic -> serve -> assert cm "
                    "(production shapes)"
    )
    parser.add_argument("--workdir", default="/tmp/hbpe_certify")
    parser.add_argument("--train-scenes", type=int, default=640)
    parser.add_argument("--det-scenes", type=int, default=256)
    parser.add_argument("--val-scenes", type=int, default=24)
    parser.add_argument("--coco-scenes", type=int, default=64)
    parser.add_argument("--pose-steps", type=int, default=4000)
    parser.add_argument("--pose-batch", type=int, default=16)
    parser.add_argument("--pose-lr", type=float, default=1e-3)
    parser.add_argument("--pose-fg-weight", type=float, default=12.0,
                        help="peak-pixel MSE up-weight (1 + w*target): "
                             "plain MSE leaves heatmap amplitudes at "
                             "0.1-0.3, under the reference's serving "
                             "gates (up to 0.46)")
    parser.add_argument("--no-calibrate", action="store_true",
                        help="skip the per-keypoint head-amplitude gate "
                             "calibration after pose training")
    parser.add_argument("--det-steps", type=int, default=1600)
    parser.add_argument("--det-batch", type=int, default=8)
    parser.add_argument("--det-lr", type=float, default=5e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--detector", default="trained", choices=("trained", "ssd"),
        help="primary detection slot for the certification: 'trained' "
             "trains EfficientDet-Lite0 on the renders; 'ssd' skips "
             "detector training and serves the REAL-weight SSD "
             "(reference ssd.tflite) — its box-height error (~2-3%% "
             "median on renders) then bounds the cm scale",
    )
    parser.add_argument(
        "--det-arch", default="lite0", choices=("lite0", "lite4"),
        help="trained-detector architecture: lite0 (fast) or lite4 — the "
             "reference's production detector (edetlite4) and the bench "
             "flagship; certifying with lite4 yields a checkpoint the "
             "flagship bench/server load directly",
    )
    parser.add_argument("--det-threshold", type=float, default=0.35,
                        help="serving form threshold for the trained "
                             "detector (focal-trained sigmoid scores run "
                             "lower than the reference's 0.70 default)")
    parser.add_argument("--tolerance-cm", type=float, default=4.0,
                        help="gate: mean |served - analytic| cm")
    parser.add_argument("--reuse-checkpoint", action="store_true",
                        help="skip training; certify the checkpoint "
                             "already in --workdir/ckpt")
    parser.add_argument("--skip-coco", action="store_true")
    parser.add_argument("--skip-ssd", action="store_true",
                        help="skip the secondary real-SSD + trained-pose "
                             "sweep")
    parser.add_argument("--smoke", action="store_true",
                        help="CPU wiring check: reduced shapes, tiny "
                             "models, marker scenes (minutes, no chip)")
    parser.add_argument("--compile-cache-dir", default="")
    parser.add_argument("--no-compile-cache", action="store_true")
    parser.add_argument(
        "--emit-compact", nargs="?", const="default", default="",
        metavar="PATH",
        help="on a CERTIFIED run, additionally write the compact "
             "committable .npz checkpoint (models/weights."
             "save_compact_checkpoint) to PATH; bare --emit-compact "
             "writes models.weights.default_certified_checkpoint() — "
             "the file bench.py and the server load for flagship "
             "weights",
    )
    args = parser.parse_args(argv)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        from human_body_proportion_estimation_tpu.utils import compile_cache

        compile_cache.enable(args.compile_cache_dir or None)

    import jax.numpy as jnp  # noqa: F401  (device selection must precede)

    from human_body_proportion_estimation_tpu.cli.evaluate import run_eval
    from human_body_proportion_estimation_tpu.models import weights
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EfficientDet,
        EfficientDetConfig,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import (
        HRNet,
        HRNetConfig,
        create_hrnet,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.training import certify as C
    from human_body_proportion_estimation_tpu.training.synthetic import (
        generate_scene,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
        ServeConfig,
    )

    t_start = time.time()
    os.makedirs(args.workdir, exist_ok=True)
    ckpt_dir = os.path.join(args.workdir, "ckpt")

    if args.smoke:
        cfg = PipelineConfig(
            detector=DetectorConfig(input_height=160, input_width=128,
                                    name="efficientdet_lite0"),
            pose=PoseConfig(crop_height=64, crop_width=32,
                            heatmap_height=16, heatmap_width=8),
            serve=ServeConfig(max_batch=4, batch_timeout_ms=5),
        )
        pose_model = HRNet(config=HRNetConfig(
            width=16, stage_modules=(1, 1, 1), blocks_per_branch=2,
            stem_channels=16, bottleneck_channels=16,
        ))
        # a sub-lite0 backbone: width 0.25 / depth ~1-rep-per-stage. XLA
        # CPU compiles the full lite0 fwd+bwd fori_loop chunk in ~40+ min
        # on this box (measured) — the smoke must stay in minutes, and
        # the wiring it certifies is backbone-size-independent
        from human_body_proportion_estimation_tpu.models.efficientnet_lite import (  # noqa: E501
            EfficientNetLiteConfig,
        )

        det_config = EfficientDetConfig(
            backbone=EfficientNetLiteConfig(0.25, 0.05),
            fpn_channels=24, fpn_repeats=1, head_repeats=1, num_classes=8,
        )
        scene_kwargs = dict(fixed_pose=True, keypoint_markers=True)
        args.train_scenes = min(args.train_scenes, 32)
        args.det_scenes = min(args.det_scenes, 32)
        args.val_scenes = min(args.val_scenes, 4)
        args.coco_scenes = min(args.coco_scenes, 8)
        args.pose_steps = min(args.pose_steps, 400)
        args.det_steps = min(args.det_steps, 300)
        args.pose_batch = 8
        args.pose_lr = 2e-3
        args.det_lr = 1e-3
        args.tolerance_cm = max(args.tolerance_cm, 8.0)
    else:
        from human_body_proportion_estimation_tpu.models.efficientdet import (  # noqa: E501
            EFFICIENTDET_LITE4,
        )

        det_name = f"efficientdet_{args.det_arch}"
        cfg = PipelineConfig(
            detector=DetectorConfig(name=det_name),
        )
        pose_model = create_hrnet("hrnet_w32")
        det_config = (EFFICIENTDET_LITE0 if args.det_arch == "lite0"
                      else EFFICIENTDET_LITE4)
        scene_kwargs = {}

    img_hw = (cfg.detector.input_height, cfg.detector.input_width)
    report: dict = {
        "mode": "smoke" if args.smoke else "chip",
        "platform": jax.devices()[0].platform,
        "img_hw": list(img_hw),
        "crop_hw": [cfg.pose.crop_height, cfg.pose.crop_width],
    }

    def log(msg):
        print(f"[certify +{time.time() - t_start:7.1f}s] {msg}",
              flush=True)

    rng = np.random.default_rng(args.seed)
    log(f"rendering {args.train_scenes} train / {args.val_scenes} val "
        f"scenes at {img_hw}")
    train_scenes = [generate_scene(rng, img_hw, **scene_kwargs)
                    for _ in range(args.train_scenes)]
    val_rng = np.random.default_rng(args.seed + 10_000)
    val_scenes = [generate_scene(val_rng, img_hw, **scene_kwargs)
                  for _ in range(args.val_scenes)]

    det_model = EfficientDet(config=det_config)

    if args.reuse_checkpoint:
        log(f"reusing checkpoint {ckpt_dir}")
    else:
        # ------------------- pose training (on device) -------------------
        crops, kp_hm, vis, _ = C.pose_crop_arrays(
            train_scenes, cfg, seed=args.seed + 1,
            box_jitter=0.0 if args.smoke else 0.08,
        )
        log(f"pose dataset {crops.shape} "
            f"({crops.nbytes / 1e6:.0f} MB device-resident); training "
            f"{args.pose_steps} steps @ batch {args.pose_batch}")
        pose_vars, pose_losses = C.train_pose_resident(
            pose_model, crops, kp_hm, vis,
            steps=args.pose_steps, batch=args.pose_batch,
            learning_rate=args.pose_lr, seed=args.seed,
            chunk=100, sigma=1.5 if args.smoke else 2.0,
            log_fn=lambda s, z: log(f"  pose step {s}: loss {z:.5f}"),
            # constant LR: the r4 chip run measured warmup+cosine
            # REGRESSING pose val 5x (25.3 vs 5.0 hm-px mean at the same
            # steps/batch/shape) — the 4k-step budget never reaches the
            # decayed tail that schedule is for
            cosine=False,
            fg_weight=args.pose_fg_weight,
        )
        report["pose_loss_first"] = pose_losses[0]
        report["pose_loss_last"] = pose_losses[-1]

        if not args.no_calibrate:
            # gate-amplitude calibration on a training-crop slice (the
            # val scenes stay held out for the accuracy numbers)
            cal = C.pose_peak_scores(pose_model, pose_vars, crops[:256])
            pose_vars, gamma = C.calibrate_pose_gates(
                pose_vars, cal, vis[:256],
                cfg.pose.keypoint_thresholds,
            )
            report["gate_gamma"] = [round(float(g), 3) for g in gamma]
            log(f"gate calibration gamma: {report['gate_gamma']}")

        # ------------------- detector training (on device) ---------------
        if args.detector == "trained":
            det_subset = train_scenes[:args.det_scenes]
            imgs, gt_boxes, gt_classes, gt_valid = C.det_arrays(det_subset)
            log(f"det dataset {imgs.shape} ({imgs.nbytes / 1e6:.0f} MB); "
                f"training {args.det_steps} steps @ batch "
                f"{args.det_batch}")
            det_vars, det_losses = C.train_det_resident(
                det_model, imgs, gt_boxes, gt_classes, gt_valid,
                steps=args.det_steps, batch=args.det_batch,
                learning_rate=args.det_lr, seed=args.seed,
                chunk=100,
                log_fn=lambda s, z: log(f"  det step {s}: loss {z:.5f}"),
                cosine=not args.smoke,
            )
            report["det_loss_first"] = det_losses[0]
            report["det_loss_last"] = det_losses[-1]
        else:
            # SSD serves its own real weights; the checkpoint's det slot
            # is a placeholder the server ignores for --detector
            # ssd_mobilenet (serve/server.py main: det_vars=None there)
            det_vars = {"unused": np.zeros((1,), np.float32)}

        weights.save_pipeline_checkpoint(ckpt_dir, det_vars, pose_vars)
        log(f"checkpoint saved to {ckpt_dir}")

    # ------------------- reload via the serving load path ----------------
    det_r, pose_r = weights.load_pipeline_checkpoint(ckpt_dir)

    # direct pose sanity on held-out crops (fail fast pre-serving)
    report["pose_val"] = pose_val_report(pose_model, pose_r, val_scenes,
                                         cfg)
    log(f"pose val: {report['pose_val']}")

    if args.detector == "ssd":
        assert not args.smoke, "--detector ssd needs production shapes"
        pipeline = InferencePipeline(
            config=PipelineConfig(
                detector=DetectorConfig(name="ssd_mobilenet"),
            ),
            detector="ssd_mobilenet", pose_vars=pose_r,
        )
        args.skip_ssd = True  # it IS the primary sweep
    elif args.smoke:
        from human_body_proportion_estimation_tpu.pipeline.backends import (
            EfficientDetBackend,
        )

        backend = EfficientDetBackend(
            EfficientDet(config=det_config,
                         person_class0=cfg.detector.person_class_id - 1),
            cfg,
        )
        pipeline = InferencePipeline(
            config=cfg, backend=backend, pose=pose_model,
            det_vars=det_r, pose_vars=pose_r,
        )
    else:
        pipeline = InferencePipeline(
            config=cfg, detector=cfg.detector.name,
            det_vars=det_r, pose_vars=pose_r,
        )

    report["det_val"] = detector_val_report(pipeline, val_scenes,
                                            args.det_threshold)
    log(f"det val: {report['det_val']}")

    # ------------------- the served-cm certification ---------------------
    log("serving sweep (trained EfficientDet-Lite0 + trained HRNet)")
    report["served"] = serve_sweep(pipeline, val_scenes,
                                   args.det_threshold)
    log(f"served: {report['served']}")

    # ------------------- accuracy table (VERDICT r2 #2) -------------------
    if not args.skip_coco:
        coco_rng = np.random.default_rng(args.seed + 20_000)
        coco_scenes = [generate_scene(coco_rng, img_hw, **scene_kwargs)
                       for _ in range(args.coco_scenes)]
        ann, imdir = write_coco_valset(
            coco_scenes, os.path.join(args.workdir, "coco_val")
        )
        log(f"COCO-protocol eval over {args.coco_scenes} scenes")
        report["coco_eval"] = run_eval(pipeline, ann, imdir, batch_size=8)
        log(f"coco: {report['coco_eval']}")

    # ------------------- secondary: real-SSD + trained pose --------------
    if not (args.skip_ssd or args.smoke):
        log("secondary sweep: real-weight SSD + trained pose")
        ssd_pipe = InferencePipeline(
            config=PipelineConfig(
                detector=DetectorConfig(name="ssd_mobilenet")
            ),
            detector="ssd_mobilenet", pose_vars=pose_r,
        )
        report["served_ssd"] = serve_sweep(ssd_pipe, val_scenes,
                                           det_threshold=0.40)
        log(f"served (ssd): {report['served_ssd']}")

    # ------------------- gates -------------------------------------------
    served = report["served"]
    gates = {
        "detection_coverage": served["detected"] >= 0.9 * len(val_scenes),
        "segment_coverage": (
            served["segments_served"]
            >= 0.85 * max(served["segments_possible"], 1)),
    }
    if args.smoke:
        # smoke certifies the DRIVER (train -> checkpoint -> serve ->
        # measure -> report), not accuracy: the shrunken detector tops out
        # around IoU ~0.2 (measured), and its box-height error feeds the
        # cm scale directly — capacity, not wiring. cm errors stay in the
        # report; the accuracy gates bind on the production-shape chip run.
        gates["pose_converged"] = (
            report.get("pose_loss_last", 0.0)
            < 0.25 * report.get("pose_loss_first", 1.0))
        if "det_loss_first" in report:
            gates["det_converged"] = (
                report["det_loss_last"] < 0.1 * report["det_loss_first"])
    else:
        gates["mean_cm_err"] = (
            served["mean_abs_cm_err"] <= args.tolerance_cm)
        gates["p95_cm_err"] = (
            served["p95_abs_cm_err"] <= 2.0 * args.tolerance_cm)
    report["gates"] = gates
    report["certified"] = all(gates.values())
    report["wall_s"] = time.time() - t_start

    if args.emit_compact and report["certified"]:
        compact_path = (weights.default_certified_checkpoint()
                        if args.emit_compact == "default"
                        else args.emit_compact)
        weights.save_compact_checkpoint(compact_path, det_r, pose_r)
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
