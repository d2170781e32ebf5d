"""Offline artifact-build CLI: models + weights -> one serving artifact.

The build-side step of the Triton model-repository analog. The reference
assembles its deployable unit offline — `models/conv.py` surgically builds
the `edetlite4_modified` SavedModel, which is dropped with the other model
dirs + config.pbtxt into `/cv_root/models` for Triton to load by convention
(`/root/reference/models/conv.py:88-103`, `README.md:47-80`). Here the
deployable unit is one directory holding the fused det+pose+proportions
program as portable StableHLO plus orbax weights plus `meta.json`:

  python -m human_body_proportion_estimation_tpu.cli.export_artifact \\
      --detector ssd_mobilenet --batch-size 16 --out /path/to/artifact

  python -m human_body_proportion_estimation_tpu.serve.server \\
      --artifact-dir /path/to/artifact

The serving side (`pipeline/export.ArtifactPipeline`) restores and runs it
without ever tracing a model, so server startup skips model construction
and the artifact pins the exact program bytes that were validated offline.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export the fused serving pipeline as a deployable "
                    "artifact (StableHLO + orbax weights + meta.json)"
    )
    parser.add_argument(
        "--detector", default="ssd_mobilenet",
        choices=["efficientdet_lite4", "efficientdet_lite0",
                 "ssd_mobilenet", "yolov5s", "yolov5m"],
        help="detector slot baked into the fused program (ssd_mobilenet "
             "is the slot with real weights out of the box)",
    )
    parser.add_argument("--checkpoint-dir", default=None,
                        help="orbax checkpoint dir with det/pose params "
                             "(cli.import_weights output)")
    parser.add_argument("--batch-size", type=int, default=16,
                        help="fixed batch size of the exported program")
    parser.add_argument(
        "--bottom-up", action="store_true",
        help="export the bottom-up pipeline instead (HigherHRNet + AE "
             "grouping, no detector); --checkpoint-dir supplies the pose "
             "slot, --detector is ignored",
    )
    parser.add_argument("--out", required=True,
                        help="output artifact directory")
    parser.add_argument("--compile-cache-dir", default="",
                        help="persistent XLA compilation cache dir")
    parser.add_argument("--no-compile-cache", action="store_true")
    args = parser.parse_args(argv)

    if not args.no_compile_cache:
        from human_body_proportion_estimation_tpu.utils import compile_cache

        compile_cache.enable(args.compile_cache_dir or None)

    if args.bottom_up:
        from human_body_proportion_estimation_tpu.pipeline.bottomup import (
            BottomUpPipeline,
        )
        from human_body_proportion_estimation_tpu.pipeline.export import (
            export_serving_artifact,
        )

        from human_body_proportion_estimation_tpu.models import weights

        pose_vars = None
        bu_certified = False
        if args.checkpoint_dir:
            _, pose_vars = weights.load_pipeline_checkpoint(
                args.checkpoint_dir
            )
        else:
            _, pose_vars = weights.maybe_load_certified(bottom_up=True)
            bu_certified = pose_vars is not None
        pipeline = BottomUpPipeline(pose_vars=pose_vars)
        if bu_certified:
            pipeline.weights_origin["pose"] = "synthetic-certified"
        if pipeline.weights_origin["pose"] == "random":
            print(
                "WARNING: exporting RANDOM-INIT HigherHRNet — the artifact "
                "will serve garbage (recorded in meta.json weights_origin)",
                flush=True,
            )
        d = export_serving_artifact(pipeline, args.out,
                                    batch_size=args.batch_size)
        print(f"exported bottom-up serving artifact to {d} "
              f"(batch_size={args.batch_size})")
        return

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
    )
    from human_body_proportion_estimation_tpu.pipeline.export import (
        export_serving_artifact,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    from human_body_proportion_estimation_tpu.models import weights

    det_vars = pose_vars = None
    certified_slots = []
    if args.checkpoint_dir:
        det_vars, pose_vars = weights.load_pipeline_checkpoint(
            args.checkpoint_dir
        )
        if args.detector == "ssd_mobilenet":
            # SSD builds its own real weights; the checkpoint's detector
            # slot is EfficientDet/YOLO-shaped (mirrors serve.server)
            det_vars = None
    else:
        det_c, pose_c = weights.maybe_load_certified()
        if pose_c is not None:
            pose_vars = pose_c
            certified_slots.append("pose")
            if args.detector == "efficientdet_lite4":
                det_vars = det_c
                certified_slots.append("detector")

    pipeline = InferencePipeline(
        det_config=(EFFICIENTDET_LITE0
                    if args.detector == "efficientdet_lite0"
                    else EFFICIENTDET_LITE4),
        det_vars=det_vars,
        pose_vars=pose_vars,
        detector=args.detector,
    )
    for slot in certified_slots:
        pipeline.weights_origin[slot] = "synthetic-certified"
    if "random" in pipeline.weights_origin.values():
        print(
            "WARNING: exporting RANDOM-INIT weights for "
            + ", ".join(k for k, v in pipeline.weights_origin.items()
                        if v == "random")
            + " — the artifact will serve garbage for that slot "
              "(recorded in meta.json weights_origin)",
            flush=True,
        )
    d = export_serving_artifact(pipeline, args.out,
                                batch_size=args.batch_size)
    print(f"exported serving artifact to {d} "
          f"(detector={args.detector}, batch_size={args.batch_size})")


if __name__ == "__main__":
    main()
