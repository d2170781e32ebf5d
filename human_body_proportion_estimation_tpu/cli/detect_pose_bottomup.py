"""Bottom-up multi-person CLI: one HigherHRNet pass, AE grouping, no
detector.

Beyond-reference capability (see pipeline/bottomup.py): the reference can
only serve HigherHRNet top-down behind a detector
(`pose_est_hrnet_trtserver.py:22-28`). Output structure mirrors the main
driver's nested list (`person_det_pose_edet4_trtserver.py:131-171`) minus
heatmaps: ``[[boxes, dist_dict_p0, dist_dict_p1, ...], ...]``.
"""

from __future__ import annotations

import os
import time
from typing import Any, List

import numpy as np

from human_body_proportion_estimation_tpu.cli.args import build_parser
from human_body_proportion_estimation_tpu.ops import proportions as prop_ops
from human_body_proportion_estimation_tpu.pipeline.bottomup import (
    BottomUpPipeline,
)
from human_body_proportion_estimation_tpu.utils import draw, io as media_io

PERSON_COLORS = [(255, 255, 0), (0, 0, 255)]


def run_bottomup(
    media_filename: str,
    person_height: float = 175.0,
    inference_mode: str = "image",
    save_result_dir: str | None = None,
    pipeline: BottomUpPipeline | None = None,
    debug: bool = True,
    batch_size: int = 8,
) -> List[List[Any]]:
    if pipeline is None:
        from human_body_proportion_estimation_tpu.models import weights

        # certified checkpoint (when committed) instead of random init
        _, pose_c = weights.maybe_load_certified(bottom_up=True)
        pipeline = BottomUpPipeline(pose_vars=pose_c)
        if pose_c is not None:
            pipeline.weights_origin["pose"] = "synthetic-certified"
    pipe = pipeline
    start = time.time()
    save_dir = None
    if save_result_dir:
        save_dir = os.path.join(save_result_dir, "tpu_bottomup_pose")
        os.makedirs(save_dir, exist_ok=True)

    if inference_mode == "video":
        frames, _fps = media_io.stream_video(media_filename)
    else:
        frames = media_io.stream_images(media_filename)

    results: List[List[Any]] = []
    counter = 0
    batch: List[np.ndarray] = []

    def flush(batch):
        nonlocal counter
        if not batch:
            return
        out = pipe.infer_images(batch, person_heights=person_height)
        for i in range(len(batch)):
            # bottom-up valid slots are NOT prefix-ordered (a slot is
            # cleared when its group has <2 visible joints, leaving
            # gaps) — unlike top-down select_persons, which top_k-sorts
            valid_slots = [s for s in range(out.person_valid.shape[1])
                           if out.person_valid[i, s]]
            entry: List[Any] = [out.boxes_orig[i][valid_slots]]
            for slot in valid_slots:
                entry.append(prop_ops.to_dist_dict(
                    out.lengths_cm[i, slot], out.seg_visible[i, slot]
                ))
            results.append(entry)
            if save_dir is not None:
                frame = batch[i].copy()
                for slot in valid_slots:
                    color = PERSON_COLORS[slot % 2]
                    y1, x1, y2, x2 = out.boxes_orig[i, slot]
                    draw.draw_box(frame, [x1, y1, x2, y2], color=color)
                    draw.draw_skeleton(
                        frame, out.keypoints[i, slot],
                        out.seg_visible[i, slot], color=color,
                    )
                    draw.draw_keypoints(
                        frame, out.keypoints[i, slot],
                        out.kp_visible[i, slot], color,
                    )
                media_io.save_image(
                    os.path.join(save_dir, f"frame_{counter:06d}.jpg"), frame
                )
            counter += 1

    for frame in frames:
        batch.append(frame)
        if len(batch) >= batch_size:
            flush(batch)
            batch = []
    flush(batch)

    if debug:
        print(f"Time to process {counter} image(s)={time.time()-start:.3f}s")
    return results


def main():
    args = build_parser(
        "Bottom-up Multi-person Pose Estimation (TPU, HigherHRNet + AE)"
    ).parse_args()
    results = run_bottomup(
        args.input_path,
        person_height=args.person_height,
        inference_mode=args.media_type,
        save_result_dir=args.output_dir or None,
        debug=args.debug,
    )
    print(results)


if __name__ == "__main__":
    main()
