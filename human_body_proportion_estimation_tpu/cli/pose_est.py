"""Pose-estimation-only CLI (pre-cropped person images).

Counterpart of the reference pose demo (`pose_est_hrnet_trtserver.py`):
RGB/255 preprocess to 288x384, HRNet heatmaps, argmax decode, keypoints
scaled from heatmap dims to the display image (:126-129), skeleton/keypoint
rendering and summed-heatmap plots.
"""

from __future__ import annotations

import os
import time

import numpy as np

from human_body_proportion_estimation_tpu.cli.args import build_parser
from human_body_proportion_estimation_tpu.pipeline.pose import (
    PosePipeline,
    preprocess_crop_host,
)
from human_body_proportion_estimation_tpu.utils import draw, io as media_io


def run_demo_pose_est(
    media_filename: str,
    model_name: str = "hrnet_w32",
    inference_mode: str = "image",
    save_result_dir: str | None = None,
    debug: bool = True,
):
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.hrnet import create_hrnet

    start = time.time()
    if model_name == "higherhrnet":
        from human_body_proportion_estimation_tpu.models.higherhrnet import (
            HigherHRNetHeatmaps,
        )

        model = HigherHRNetHeatmaps()
    else:
        model = create_hrnet(model_name)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 3), jnp.float32)
        )
    variables = jax.device_put(variables, jax.devices()[0])
    program = PosePipeline(model).jit()

    save_dir = None
    if save_result_dir:
        save_dir = os.path.join(save_result_dir, f"tpu_{model_name}")
        os.makedirs(save_dir, exist_ok=True)

    if inference_mode == "video":
        frames, fps = media_io.stream_video(media_filename)
    else:
        frames = media_io.stream_images(media_filename)
        fps = 1.0

    writer = None
    outputs = []
    for counter, frame in enumerate(frames):
        model_in = preprocess_crop_host(frame)
        res = program(variables, jnp.asarray(model_in[None]))
        heatmap = np.asarray(res.heatmaps[0])
        kp = np.asarray(res.keypoints[0])
        scores = np.asarray(res.scores[0])
        outputs.append((kp, scores, heatmap))

        if save_dir is not None:
            draw.save_heatmap_plot(
                heatmap, os.path.join(save_dir, f"heatmap_{counter:06d}.jpg")
            )
            ih, iw = frame.shape[:2]
            _, hm_h, hm_w = heatmap.shape
            kp_img = kp / [hm_w, hm_h] * [iw, ih]  # :126-129
            draw.draw_skeleton(
                frame, kp_img, np.ones(11, bool), color=(0, 0, 255),
                thickness=2,
            )
            draw.draw_keypoints(frame, kp_img, None, (0, 0, 255))
            if inference_mode == "video":
                if writer is None:
                    writer = media_io.VideoWriter(
                        os.path.join(save_dir, "res_video.mp4"),
                        max(fps - 10, 1.0), frame.shape[1], frame.shape[0],
                    )
                writer.write(frame)
            else:
                media_io.save_image(
                    os.path.join(save_dir, f"frame_{counter:06d}.jpg"), frame
                )
    if writer is not None:
        writer.close()
    if debug:
        print(f"Time to process {len(outputs)} image(s)="
              f"{time.time()-start:.3f}s")
    return outputs


def main():
    parser = build_parser("Single Person Pose Estimation (TPU)")
    parser.add_argument("--model", default="hrnet_w32",
                        choices=("hrnet_w32", "hrnet_w48", "higherhrnet"))
    args = parser.parse_args()
    run_demo_pose_est(
        args.input_path,
        model_name=args.model,
        inference_mode=args.media_type,
        save_result_dir=args.output_dir or None,
        debug=args.debug,
    )


if __name__ == "__main__":
    main()
