"""EfficientDet detection-only CLI.

Counterpart of the reference EfficientDet demo
(`obj_det_edet4_trtserver.py`): uint8 640x480 input, detection tensors in
the "modified-model" schema (pixel y1x1y2x2 + scores + 1-based classes,
:22-37), box drawing with per-run colors, frame/video outputs. Detections
are auto-scaled from the model input size to the displayed image
(:136-141).

`-g/--grpc_port` switches to remote mode: the driver calls the serving
edge's named `edetlite4` model over the tensor-level ModelInfer RPC — the
reference's client/Triton split (`obj_det_edet4_trtserver.py:53`).
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


def _remote_infer_fn(grpc_target: str):
    """Per-frame closure against the serving edge's named `edetlite4`
    model via ModelInfer (the reference's Triton-client architecture,
    `obj_det_edet4_trtserver.py:53` + triton_utils) — boxes come back in
    the sent image's pixel space, scores 0 on empty slots."""
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
    )

    if ":" not in grpc_target:
        grpc_target = f"127.0.0.1:{grpc_target}"
    client = GrpcClient(grpc_target)

    def infer(model_in_u8: np.ndarray):
        out = client.infer("edetlite4", {"image": model_in_u8[None]})
        boxes = out["output_0"][0]
        scores = out["output_1"][0]
        classes = out["output_2"][0]
        return boxes, scores, classes, scores > 0.0

    return infer


def run_demo_odet(
    media_filename: str,
    inference_mode: str = "image",
    det_threshold: float = 0.55,
    save_result_dir: str | None = None,
    detector_name: str = "efficientdet_lite4",
    debug: bool = True,
    input_hw=(480, 640),
    grpc_target: str | None = None,
):
    """Detection demo; returns per-frame (boxes, scores, classes) numpy."""
    import jax

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
        EfficientDet,
    )

    start = time.time()
    if grpc_target:
        infer_fn = _remote_infer_fn(grpc_target)
    else:
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

        def infer_fn(model_in_u8: np.ndarray):
            dets = program(det_vars, jnp.asarray(model_in_u8[None]))
            return (
                np.asarray(dets.boxes[0]),
                np.asarray(dets.scores[0]),
                np.asarray(dets.classes[0]),
                np.asarray(dets.valid[0]),
            )

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
        boxes, scores, classes, valid = infer_fn(model_in)
        valid = valid & (scores >= det_threshold)
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
        grpc_target=args.grpc_port,
    )


if __name__ == "__main__":
    main()
