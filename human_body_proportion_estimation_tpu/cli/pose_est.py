"""Pose-estimation-only CLI (pre-cropped person images).

Counterpart of the reference pose demo (`pose_est_hrnet_trtserver.py`):
RGB/255 preprocess to 288x384, HRNet heatmaps, argmax decode, keypoints
scaled from heatmap dims to the display image (:126-129), skeleton/keypoint
rendering and summed-heatmap plots.

Two execution modes, mirroring the reference's client/server split:
in-process (default — the model runs in this process's jit program) and
remote via `-g/--grpc_port`: the driver calls the serving edge's named
`hrnet`/`higherhrnet` model through the tensor-level ModelInfer RPC —
exactly the reference's architecture, where `-g` addresses Triton's gRPC
port and heatmaps come back over the wire
(`pose_est_hrnet_trtserver.py:31-52`, `modules/triton_utils.py:131-177`).
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


def _decode_heatmaps_np(hm: np.ndarray):
    """Host-side argmax decode for remote heatmaps: (x=idx%w, y=idx//w),
    conf=max — reference `pose_estimator.py:75-99`."""
    b, k, h, w = hm.shape
    flat = hm.reshape(b, k, -1)
    idx = flat.argmax(-1)
    conf = flat.max(-1)
    kp = np.stack([idx % w, idx // w], axis=-1).astype(np.float32)
    return kp, conf.astype(np.float32)


def _remote_infer_fn(grpc_target: str, model_name: str):
    """Inference closure driving the serving edge's named model via the
    tensor-level ModelInfer RPC (the tritonclient role)."""
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
    )

    if ":" not in grpc_target:
        grpc_target = f"127.0.0.1:{grpc_target}"
    client = GrpcClient(grpc_target)
    reg_name = "higherhrnet" if model_name == "higherhrnet" else "hrnet"
    # hrnet heatmaps arrive as "output", higherhrnet's as "output_2" —
    # the same dual contract the reference postprocess dispatches on
    # (pose_est_hrnet_trtserver.py:22-28)
    out_name = "output_2" if reg_name == "higherhrnet" else "output"
    # metadata-driven input sizing (parse_model_grpc, triton_utils.py:54-72)
    # with the reference's 512x512 fallback for dynamic dims (:51-52)
    meta = client.model_metadata(reg_name)
    _, _, mh, mw = meta["inputs"][0]["shape"]
    in_w = 512 if mw == -1 else mw
    in_h = 512 if mh == -1 else mh

    def infer(model_in_nhwc: np.ndarray):
        nchw = np.ascontiguousarray(
            np.transpose(model_in_nhwc, (0, 3, 1, 2)), dtype=np.float32
        )
        hm = client.infer(reg_name, {"input": nchw}, [out_name])[out_name]
        kp, conf = _decode_heatmaps_np(hm)
        return hm[0], kp[0], conf[0]

    return infer, (in_w, in_h)


def _local_infer_fn(model_name: str):
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.hrnet import create_hrnet

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

    def infer(model_in_nhwc: np.ndarray):
        res = program(variables, jnp.asarray(model_in_nhwc))
        return (
            np.asarray(res.heatmaps[0]),
            np.asarray(res.keypoints[0]),
            np.asarray(res.scores[0]),
        )

    return infer, (288, 384)  # reference crop W x H (conv.py:61)


def run_demo_pose_est(
    media_filename: str,
    model_name: str = "hrnet_w32",
    inference_mode: str = "image",
    save_result_dir: str | None = None,
    debug: bool = True,
    grpc_target: str | None = None,
):
    start = time.time()
    if grpc_target:
        infer_fn, (in_w, in_h) = _remote_infer_fn(grpc_target, model_name)
    else:
        infer_fn, (in_w, in_h) = _local_infer_fn(model_name)

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
        model_in = preprocess_crop_host(frame, in_w, in_h)
        heatmap, kp, scores = infer_fn(model_in[None])
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
        grpc_target=args.grpc_port,
    )


if __name__ == "__main__":
    main()
