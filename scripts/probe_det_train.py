"""Chip probe: detector-only training quality at production shape.

The r03 certify chip run trained EfficientDet-Lite0 @ 480x640 for 1600
steps from a zero class-head bias and ended with val coverage 0/24
(report /tmp/hbpe_certify/report.json: det_val missed 24, coco box mAP
0.053). This probe iterates the fixed recipe (focal-prior bias init,
warmup+cosine LR, grad clip — training/detection.create_det_train_state)
without paying for pose training: render scenes, train the detector,
report coverage / IoU / box-height error / score distribution on
held-out scenes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_det_train.py \
        [--arch lite0] [--scenes 512] [--steps 2500] [--batch 8]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="lite0", choices=("lite0", "lite4"))
    ap.add_argument("--scenes", type=int, default=512)
    ap.add_argument("--val-scenes", type=int, default=24)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--thresholds", default="0.2,0.35,0.5")
    args = ap.parse_args()

    from human_body_proportion_estimation_tpu.utils import compile_cache

    compile_cache.enable()

    from human_body_proportion_estimation_tpu.cli.certify import (
        detector_val_report,
    )
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
        EfficientDet,
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
    )

    t0 = time.time()

    def log(msg):
        print(f"[probe +{time.time() - t0:6.1f}s] {msg}", flush=True)

    cfg = PipelineConfig(
        detector=DetectorConfig(name=f"efficientdet_{args.arch}")
    )
    img_hw = (cfg.detector.input_height, cfg.detector.input_width)
    det_config = (EFFICIENTDET_LITE0 if args.arch == "lite0"
                  else EFFICIENTDET_LITE4)

    rng = np.random.default_rng(args.seed)
    log(f"rendering {args.scenes} train scenes at {img_hw}")
    train_scenes = [generate_scene(rng, img_hw)
                    for _ in range(args.scenes)]
    val_rng = np.random.default_rng(args.seed + 10_000)
    val_scenes = [generate_scene(val_rng, img_hw)
                  for _ in range(args.val_scenes)]
    imgs, gt_boxes, gt_classes, gt_valid = C.det_arrays(train_scenes)
    log(f"det dataset {imgs.shape} ({imgs.nbytes / 1e6:.0f} MB)")

    model = EfficientDet(config=det_config)
    det_vars, losses = C.train_det_resident(
        model, imgs, gt_boxes, gt_classes, gt_valid,
        steps=args.steps, batch=args.batch, learning_rate=args.lr,
        seed=args.seed, chunk=100,
        log_fn=lambda s, z: log(f"  det step {s}: loss {z:.5f}"),
    )
    log(f"loss first={losses[0]:.3f} last={losses[-1]:.5f}")

    pipeline = InferencePipeline(
        config=cfg, detector=cfg.detector.name, det_vars=det_vars,
    )
    out = {}
    for th in (float(t) for t in args.thresholds.split(",")):
        rep = detector_val_report(pipeline, val_scenes, th)
        log(f"threshold {th}: {rep}")
        out[f"val@{th}"] = rep
    out["loss_first"] = losses[0]
    out["loss_last"] = losses[-1]
    out["wall_s"] = time.time() - t0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
