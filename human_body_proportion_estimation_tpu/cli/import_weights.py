"""Offline weight-conversion CLI: upstream pretrained formats -> one orbax
pipeline checkpoint consumable by `serve.server --checkpoint-dir`.

The reference distributes weights as a Google-Drive zip of SavedModel/ONNX/
TensorRT blobs that Triton loads by directory convention
(`/root/reference/README.md:13-26`); the conversion there happens implicitly
inside Triton's runtimes. Here conversion is an explicit, verifiable step:

  python -m human_body_proportion_estimation_tpu.cli.import_weights \\
      --efficientdet-ckpt /path/to/efficientdet-lite4/model \\
      --hrnet-torch /path/to/pose_hrnet_w32_384x288.pth \\
      --out /path/to/ckpt_dir

Sources (any subset; missing slots fall back to random init with the
server's loud warning):
  --efficientdet-ckpt         automl TF checkpoint prefix
  --efficientdet-saved-model  TF SavedModel dir (the reference's own format)
  --hrnet-torch               official pose_hrnet state_dict (.pth)
  --yolo-torch                ultralytics yolov5 state_dict (.pt); fills
                              the detector slot instead of EfficientDet
                              (serve with --detector yolov5s|m)
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert upstream pretrained weights to an orbax "
                    "pipeline checkpoint"
    )
    parser.add_argument("--efficientdet-ckpt", default=None,
                        help="automl TF checkpoint path/prefix")
    parser.add_argument("--efficientdet-saved-model", default=None,
                        help="TF SavedModel export dir")
    parser.add_argument("--efficientdet-variant", default="lite4",
                        choices=["lite0", "lite4"])
    parser.add_argument("--yolo-torch", default=None,
                        help="ultralytics yolov5 .pt state_dict; takes the "
                             "detector slot instead of EfficientDet")
    parser.add_argument("--yolo-variant", default="yolov5m",
                        choices=["yolov5s", "yolov5m", "yolov5l"])
    parser.add_argument("--hrnet-torch", default=None,
                        help="pose_hrnet .pth state_dict")
    parser.add_argument("--higherhrnet-torch", default=None,
                        help="official pose_higher_hrnet .pth state_dict; "
                             "fills the pose slot with HigherHRNet for the "
                             "bottom-up server mode (--bottom-up "
                             "--checkpoint-dir)")
    parser.add_argument("--pose-name", default="hrnet_w32",
                        choices=["hrnet_w32", "hrnet_w48"])
    parser.add_argument("--out", required=True,
                        help="output orbax checkpoint dir")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models import weights as W
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
        EfficientDet,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import (
        HRNET_W32,
        HRNET_W48,
        create_hrnet,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        PipelineConfig,
    )

    cfg = PipelineConfig()
    cpu = jax.devices("cpu")[0]
    rng = jax.random.PRNGKey(0)

    det_cfg = (EFFICIENTDET_LITE0 if args.efficientdet_variant == "lite0"
               else EFFICIENTDET_LITE4)
    with jax.default_device(cpu):
        if args.yolo_torch:
            from human_body_proportion_estimation_tpu.pipeline.backends import (
                YoloBackend,
            )

            det_vars = YoloBackend(
                cfg, variant=args.yolo_variant
            ).init_vars(rng)
        else:
            det_model = EfficientDet(config=det_cfg)
            det_vars = det_model.init(
                rng,
                jnp.zeros((1, cfg.detector.input_height,
                           cfg.detector.input_width, 3), jnp.float32),
            )
        if args.higherhrnet_torch:
            from human_body_proportion_estimation_tpu.models.higherhrnet import (
                HigherHRNet,
            )

            pose_model = HigherHRNet()
            pose_vars = pose_model.init(
                rng, jnp.zeros((1, 512, 512, 3), jnp.float32)
            )
        else:
            pose_model = create_hrnet(args.pose_name)
            pose_vars = pose_model.init(
                rng,
                jnp.zeros((1, cfg.pose.crop_height, cfg.pose.crop_width, 3),
                          jnp.float32),
            )

    if args.yolo_torch:
        import torch

        from human_body_proportion_estimation_tpu.models import yolo_weights
        from human_body_proportion_estimation_tpu.models.yolov5 import (
            YOLOV5L,
            YOLOV5M,
            YOLOV5S,
        )

        state = torch.load(args.yolo_torch, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state_np = {k: v.numpy() for k, v in state.items()}
        ycfg = {"yolov5s": YOLOV5S, "yolov5m": YOLOV5M,
                "yolov5l": YOLOV5L}[args.yolo_variant]
        det_vars = yolo_weights.import_torch_yolov5(state_np, det_vars, ycfg)
        print(f"imported {args.yolo_variant} ({len(state_np)} torch tensors)")
    elif args.efficientdet_ckpt or args.efficientdet_saved_model:
        from human_body_proportion_estimation_tpu.models import tf_import

        if args.efficientdet_ckpt:
            arrays = tf_import.load_tf_checkpoint_arrays(
                args.efficientdet_ckpt
            )
        else:
            arrays = tf_import.load_saved_model_arrays(
                args.efficientdet_saved_model
            )
        det_vars = tf_import.import_tf_efficientdet(
            arrays, det_vars, det_cfg, strict=True
        )
        print(f"imported EfficientDet-{args.efficientdet_variant} "
              f"({len(arrays)} TF tensors)")
    else:
        print("WARNING: no EfficientDet source given — detector slot stays "
              "random-init")

    if args.higherhrnet_torch:
        import torch

        state = torch.load(args.higherhrnet_torch, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state_np = {k: v.numpy() for k, v in state.items()}
        pose_vars = W.import_torch_higherhrnet(state_np, pose_vars)
        print(f"imported HigherHRNet ({len(state_np)} torch tensors)")
    elif args.hrnet_torch:
        import torch

        state = torch.load(args.hrnet_torch, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state_np = {k: v.numpy() for k, v in state.items()}
        hr_cfg = HRNET_W32 if args.pose_name == "hrnet_w32" else HRNET_W48
        pose_vars = W.import_torch_hrnet(state_np, pose_vars, hr_cfg)
        print(f"imported HRNet ({len(state_np)} torch tensors)")
    else:
        print("WARNING: no HRNet source given — pose slot stays random-init")

    W.save_pipeline_checkpoint(args.out, det_vars, pose_vars)
    print(f"wrote pipeline checkpoint to {args.out}")


if __name__ == "__main__":
    main()
