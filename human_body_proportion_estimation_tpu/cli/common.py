"""Shared CLI helpers."""

from __future__ import annotations

from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)


def build_pipeline(args) -> InferencePipeline:
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
    )

    det_cfg = (
        EFFICIENTDET_LITE0
        if getattr(args, "detector", "") == "efficientdet_lite0"
        else EFFICIENTDET_LITE4
    )
    det_vars = pose_vars = None
    if getattr(args, "checkpoint_dir", None):
        from human_body_proportion_estimation_tpu.models import weights

        det_vars, pose_vars = weights.load_pipeline_checkpoint(
            args.checkpoint_dir
        )
    return InferencePipeline(
        det_config=det_cfg, det_vars=det_vars, pose_vars=pose_vars
    )
