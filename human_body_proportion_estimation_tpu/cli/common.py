"""Shared CLI helpers."""

from __future__ import annotations

from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)


def build_pipeline(args=None) -> InferencePipeline:
    """Pipeline for the top-down CLIs. With no --checkpoint-dir the
    committed synthetic-certified checkpoint backs any slot that would
    otherwise random-init (models/weights.maybe_load_certified) — the
    reference drivers never run untrained weights (README.md:13-26)."""
    from human_body_proportion_estimation_tpu.models import weights
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
    certified_slots = []
    if getattr(args, "checkpoint_dir", None):
        det_vars, pose_vars = weights.load_pipeline_checkpoint(
            args.checkpoint_dir
        )
    else:
        det_c, pose_c = weights.maybe_load_certified()
        if pose_c is not None:
            pose_vars = pose_c
            certified_slots.append("pose")
            if det_cfg is EFFICIENTDET_LITE4:
                det_vars = det_c
                certified_slots.append("detector")
    pipe = InferencePipeline(
        det_config=det_cfg, det_vars=det_vars, pose_vars=pose_vars
    )
    for slot in certified_slots:
        pipe.weights_origin[slot] = "synthetic-certified"
    return pipe
