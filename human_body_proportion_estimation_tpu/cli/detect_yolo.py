"""YOLOv5 detection CLI.

Counterpart of both reference YOLOv5 demos — the Triton one
(`obj_det_yolov5_trtserver.py`: letterbox 640, conf 0.4 / IoU 0.5 NMS,
scale_coords back, :30-44,153-154) and the serverless onnxruntime one
(`obj_det_yolov5_onnx.py`) — in one driver: the same jit program runs on
TPU by default or on the CPU backend with `--cpu` (the numeric-parity
configuration, BASELINE config 1).

`-g/--grpc_port` switches to remote mode — the reference's exact split:
the named `yolov5m`/`yolov5s` model runs server-side (ModelInfer RPC
returning the [N, 25200, 85] prediction tensor) and NMS runs CLIENT-side
(`obj_det_yolov5_trtserver.py:40-44` does it in torch; here it is the
same jit `yolo_nms` the in-process path uses).
"""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np

from human_body_proportion_estimation_tpu.cli.args import (
    COCO_CLASSES,
    build_parser,
)
from human_body_proportion_estimation_tpu.pipeline.detect import (
    YoloDetectPipeline,
    letterbox_host,
    scale_boxes_to_original,
)
from human_body_proportion_estimation_tpu.utils import draw, io as media_io

MODEL_SIZE = 640


def _remote_infer_fn(grpc_target: str, model_name: str,
                     det_threshold: float, iou_threshold: float,
                     legacy_nms: bool = False, num_classes: int = 80):
    """Remote per-frame closure: model forward + decode server-side via
    ModelInfer, NMS client-side (the reference's Triton split)."""
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.ops.nms import (
        yolo_nms,
        yolo_nms_legacy,
    )
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
    )

    if ":" not in grpc_target:
        grpc_target = f"127.0.0.1:{grpc_target}"
    client = GrpcClient(grpc_target)
    if legacy_nms:
        nms_prog = jax.jit(
            lambda p: yolo_nms_legacy(
                p, num_classes, det_threshold, iou_threshold, 300, 512
            )
        )
    else:
        nms_prog = jax.jit(
            lambda p: yolo_nms(p, det_threshold, iou_threshold, 300, 512)
        )

    def infer(model_in: np.ndarray):  # [S, S, 3] f32 letterboxed /255
        nchw = np.ascontiguousarray(
            np.transpose(model_in[None], (0, 3, 1, 2)), dtype=np.float32
        )
        preds = client.infer(model_name, {"images": nchw})["output"]
        res = nms_prog(jnp.asarray(preds[0]))
        return (
            np.asarray(res.valid), np.asarray(res.boxes),
            np.asarray(res.scores), np.asarray(res.classes),
        )

    return infer


def run_demo_odet(
    media_filename: str,
    inference_mode: str = "image",
    det_threshold: float = 0.4,
    iou_threshold: float = 0.5,
    save_result_dir: str | None = None,
    model_name: str = "yolov5m",
    use_cpu: bool = False,
    debug: bool = True,
    grpc_target: str | None = None,
    legacy_nms: bool = False,
    num_classes: int = 80,
):
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.yolov5 import (
        YOLOV5M,
        YOLOV5S,
        YoloV5,
    )

    start = time.time()
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    if grpc_target:
        infer_fn = _remote_infer_fn(
            grpc_target, model_name, det_threshold, iou_threshold,
            legacy_nms=legacy_nms, num_classes=num_classes,
        )
    else:
        cfg = YOLOV5S if model_name == "yolov5s" else YOLOV5M
        model = YoloV5(
            config=cfg, dtype=jnp.float32 if use_cpu else jnp.bfloat16
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, MODEL_SIZE, MODEL_SIZE, 3), jnp.float32),
            )
        variables = jax.device_put(variables, jax.devices()[0])
        program = YoloDetectPipeline(
            model, conf_thres=det_threshold, iou_thres=iou_threshold,
            legacy_nms=legacy_nms, num_classes=num_classes,
        ).jit()

        def infer_fn(model_in: np.ndarray):
            dets = program(variables, jnp.asarray(model_in[None]))
            return (
                np.asarray(dets.valid[0]), np.asarray(dets.boxes[0]),
                np.asarray(dets.scores[0]), np.asarray(dets.classes[0]),
            )

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
    outputs: List = []
    for counter, frame in enumerate(frames):
        model_in = letterbox_host(frame, MODEL_SIZE)
        valid, boxes, scores, classes = infer_fn(model_in)
        boxes = boxes[valid]
        scores = scores[valid]
        classes = classes[valid]
        boxes = scale_boxes_to_original(
            boxes, MODEL_SIZE, frame.shape[:2]
        ) if len(boxes) else boxes
        outputs.append((boxes, scores, classes))

        if save_dir is not None:
            for bx, sc, cl in zip(boxes, scores, classes):
                name = COCO_CLASSES[int(cl)] \
                    if 0 <= int(cl) < len(COCO_CLASSES) else str(int(cl))
                # per-class seeded color, reference scheme
                # (`obj_det_yolov5_onnx.py:56-57`)
                draw.draw_box(frame, bx, color=draw.class_color(int(cl)),
                              label=f"{name} {sc:.2f}")
            if inference_mode == "video":
                if writer is None:
                    writer = media_io.VideoWriter(
                        os.path.join(save_dir, "res_video.mp4"),
                        max(fps - 10, 1.0), frame.shape[1], frame.shape[0],
                    )
                writer.write(frame)
            else:
                media_io.save_image(
                    os.path.join(save_dir, f"frame_{counter:05d}.jpg"), frame
                )
    if writer is not None:
        writer.close()
    if debug:
        backend = jax.devices()[0].platform
        print(f"Inference time ({backend}): {time.time()-start:.2f}s")
    return outputs


def main():
    parser = build_parser("YOLOv5 Object Detection (TPU)")
    parser.add_argument("--model", default="yolov5m",
                        choices=("yolov5s", "yolov5m"))
    parser.add_argument("--cpu", action="store_true",
                        help="run on the CPU backend (numeric-parity path)")
    parser.add_argument("--legacy-nms", action="store_true",
                        help="use the reference's second YOLO postprocess "
                             "(`w_non_max_suppression`, modules/"
                             "onnx_utils.py:39-95: obj-conf gating + "
                             "per-class +1-IoU NMS); -c/--num_classes sets "
                             "its class-column count")
    args = parser.parse_args()
    run_demo_odet(
        args.input_path,
        inference_mode=args.media_type,
        det_threshold=args.detection_threshold,
        save_result_dir=args.output_dir or None,
        model_name=args.model,
        use_cpu=args.cpu,
        debug=args.debug,
        grpc_target=args.grpc_port,
        legacy_nms=args.legacy_nms,
        num_classes=args.num_classes,
    )


if __name__ == "__main__":
    main()
