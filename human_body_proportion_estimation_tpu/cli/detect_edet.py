"""EfficientDet detection-only CLI.

Counterpart of the reference EfficientDet demo
(`obj_det_edet4_trtserver.py`): uint8 640x480 input, detection tensors in
the "modified-model" schema (pixel y1x1y2x2 + scores + 1-based classes,
:22-37), box drawing with per-run colors, frame/video outputs. Detections
are auto-scaled from the model input size to the displayed image
(:136-141).
"""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.cli.args import (
    COCO_CLASSES,
    build_parser,
)
from human_body_proportion_estimation_tpu.pipeline.detect import (
    EdetDetectPipeline,
)
from human_body_proportion_estimation_tpu.pipeline.host import (
    resize_for_detector,
)
from human_body_proportion_estimation_tpu.utils import draw, io as media_io


def run_demo_odet(
    media_filename: str,
    inference_mode: str = "image",
    det_threshold: float = 0.55,
    save_result_dir: str | None = None,
    detector_name: str = "efficientdet_lite4",
    debug: bool = True,
    input_hw=(480, 640),
):
    """Detection demo; returns per-frame (boxes, scores, classes) numpy."""
    import jax

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
        EfficientDet,
    )

    start = time.time()
    cfg = (EFFICIENTDET_LITE0 if detector_name == "efficientdet_lite0"
           else EFFICIENTDET_LITE4)
    detector = EfficientDet(config=cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        det_vars = detector.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *input_hw, 3), jnp.float32),
        )
    det_vars = jax.device_put(det_vars, jax.devices()[0])
    program = EdetDetectPipeline(detector, input_hw).jit()

    save_dir = None
    if save_result_dir:
        save_dir = os.path.join(save_result_dir, f"tpu_{detector_name}")
        os.makedirs(save_dir, exist_ok=True)

    if inference_mode == "video":
        frames, fps = media_io.stream_video(media_filename)
    else:
        frames = media_io.stream_images(media_filename)
        fps = 1.0

    writer = None
    outputs: List = []
    h, w = input_hw
    for counter, frame in enumerate(frames):
        model_in = resize_for_detector(frame, w, h)
        dets = program(det_vars, jnp.asarray(model_in[None]))
        boxes = np.asarray(dets.boxes[0])
        scores = np.asarray(dets.scores[0])
        classes = np.asarray(dets.classes[0])
        valid = np.asarray(dets.valid[0]) & (scores >= det_threshold)
        outputs.append((boxes[valid], scores[valid], classes[valid]))

        if save_dir is not None:
            oh, ow = frame.shape[:2]
            # scale det-input pixel coords to the original image (:136-141)
            sy, sx = oh / h, ow / w
            for (y1, x1, y2, x2), sc, cl in zip(
                boxes[valid], scores[valid], classes[valid]
            ):
                name = COCO_CLASSES[int(cl) - 1] \
                    if 1 <= int(cl) <= len(COCO_CLASSES) else str(int(cl))
                draw.draw_box(
                    frame, [x1 * sx, y1 * sy, x2 * sx, y2 * sy],
                    color=(255, 0, 0), label=f"{name} {sc:.2f}",
                )
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
    args = build_parser("EfficientDet Object Detection (TPU)").parse_args()
    run_demo_odet(
        args.input_path,
        inference_mode=args.media_type,
        det_threshold=args.detection_threshold,
        save_result_dir=args.output_dir or None,
        detector_name=args.detector,
        debug=args.debug,
    )


if __name__ == "__main__":
    main()
