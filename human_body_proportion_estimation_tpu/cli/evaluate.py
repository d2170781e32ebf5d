"""Evaluate a pipeline against COCO-format annotations: person-box mAP +
keypoint OKS-AP (and PCK), printed as one JSON object.

The reference has no evaluation entry point at all — its accuracy claim
is inherited from the upstream zoos' published COCO numbers (SURVEY §6).
This CLI closes the loop for imported checkpoints:

    python -m ...cli.import_weights --hrnet pose_hrnet_w32.pth --out ckpt/
    python -m ...cli.evaluate --annotations person_keypoints_val.json \
        --images-dir val2017/ --detector ssd_mobilenet --checkpoint-dir ckpt/

Caveat (by design, shared with the reference): the fused pipeline keeps
at most `max_persons` (3) slots per image — the reference's top-3 ensemble
contract (`models/conv.py:36-40`) — so AP on images with more people is
a lower bound. Evaluation runs with detection threshold 0.05 so the AP
sweep sees low-confidence detections.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def load_coco(path: str):
    """COCO-format dict -> (images [(id, file_name)], per-image gt:
    boxes xyxy, keypoints [M,17,2], visible [M,17], areas [M])."""
    with open(path) as f:
        coco = json.load(f)
    person_cat = {
        c["id"] for c in coco.get("categories", [])
        if c.get("name") == "person"
    } or {1}
    gt = defaultdict(lambda: {"boxes": [], "kps": [], "vis": [],
                              "areas": []})
    for a in coco["annotations"]:
        if a.get("category_id") not in person_cat or a.get("iscrowd"):
            continue
        x, y, w, h = a["bbox"]
        g = gt[a["image_id"]]
        g["boxes"].append([x, y, x + w, y + h])
        g["areas"].append(a.get("area", w * h))
        kp = np.asarray(a.get("keypoints", [0] * 51),
                        np.float32).reshape(-1, 3)
        g["kps"].append(kp[:, :2])
        g["vis"].append(kp[:, 2] > 0)
    images = [(im["id"], im["file_name"]) for im in coco["images"]]
    return images, gt


def run_eval(
    pipe,
    annotations: str,
    images_dir: str,
    limit: int = 0,
    batch_size: int = 8,
) -> dict:
    """Evaluate an already-built pipeline over a COCO-format val set.

    Factored out of `main` so callers that already hold a compiled
    pipeline (cli/certify.py's trained-checkpoint certification) can fill
    the accuracy table without rebuilding + recompiling the fused program.
    """
    import cv2

    from human_body_proportion_estimation_tpu.metrics import (
        detection_ap,
        oks_ap,
        pck,
    )

    images, gt = load_coco(annotations)
    if limit:
        images = images[:limit]

    det_preds, det_gts = [], []
    kp_preds, kp_gts = [], []
    pck_scores = []
    n_missing = 0
    for start in range(0, len(images), batch_size):
        chunk = images[start:start + batch_size]
        frames, ids = [], []
        for img_id, fname in chunk:
            p = os.path.join(images_dir, fname)
            bgr = cv2.imread(p)
            if bgr is None:
                n_missing += 1
                continue
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            ids.append(img_id)
        if not frames:
            continue
        out = pipe.infer_images(frames, person_heights=175.0,
                                det_threshold=0.05)
        for i, img_id in enumerate(ids):
            valid = np.asarray(out.person_valid[i], bool)
            yxyx = np.asarray(out.boxes_orig[i], np.float32)[valid]
            boxes = yxyx[:, [1, 0, 3, 2]]  # -> xyxy like COCO gt
            scores = np.asarray(out.det_scores[i], np.float32)[valid]
            g = gt[img_id]
            g_boxes = np.asarray(g["boxes"], np.float32).reshape(-1, 4)
            det_preds.append((boxes, scores))
            det_gts.append(g_boxes)

            if g["kps"]:
                kps = np.asarray(out.keypoints[i], np.float32)[valid]
                kp_preds.append((kps, scores))
                g_kps = np.stack(g["kps"])
                g_vis = np.stack(g["vis"])
                g_area = np.asarray(g["areas"], np.float32)
                kp_gts.append((g_kps, g_vis, g_area))
                # PCK of prediction slot p against gt slot p (index
                # aligned after both are filtered to persons), bbox-
                # diagonal normalization
                m = min(len(kps), len(g_kps))
                if m:
                    diag = np.linalg.norm(
                        g_boxes[:m, 2:] - g_boxes[:m, :2], axis=-1
                    )
                    v = pck(kps[:m], g_kps[:m], g_vis[:m], diag,
                            threshold=0.1)
                    if np.isfinite(v):
                        pck_scores.append(v)

    det = detection_ap(det_preds, det_gts)
    result = {
        "weights": dict(pipe.weights_origin),
        "images": len(det_preds),
        "missing_files": n_missing,
        "box_mAP": det["mAP"], "box_AP50": det["AP50"],
        "box_AP75": det["AP75"],
    }
    if kp_preds:
        kp = oks_ap(kp_preds, kp_gts)
        result.update({
            "kp_mAP": kp["mAP"], "kp_AP50": kp["AP50"],
            "kp_AP75": kp["AP75"],
            "PCK@0.1diag": (float(np.mean(pck_scores))
                            if pck_scores else float("nan")),
        })
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="COCO-protocol evaluation of the fused pipeline"
    )
    parser.add_argument("--annotations", required=True,
                        help="COCO-format JSON (bbox and/or keypoints)")
    parser.add_argument("--images-dir", required=True)
    parser.add_argument(
        "--detector", default="ssd_mobilenet",
        choices=["efficientdet_lite4", "efficientdet_lite0",
                 "ssd_mobilenet", "yolov5s", "yolov5m"],
    )
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--limit", type=int, default=0,
                        help="evaluate only the first N images (0 = all)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--compile-cache-dir", default="")
    parser.add_argument("--no-compile-cache", action="store_true")
    args = parser.parse_args(argv)

    if not args.no_compile_cache:
        from human_body_proportion_estimation_tpu.utils import compile_cache

        compile_cache.enable(args.compile_cache_dir or None)

    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    det_vars = pose_vars = None
    if args.checkpoint_dir:
        from human_body_proportion_estimation_tpu.models import weights

        det_vars, pose_vars = weights.load_pipeline_checkpoint(
            args.checkpoint_dir
        )
        if args.detector == "ssd_mobilenet":
            det_vars = None  # SSD loads its own real weights
    pipe = InferencePipeline(detector=args.detector, det_vars=det_vars,
                             pose_vars=pose_vars)

    result = {"detector": args.detector}
    result.update(run_eval(
        pipe, args.annotations, args.images_dir,
        limit=args.limit, batch_size=args.batch_size,
    ))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
