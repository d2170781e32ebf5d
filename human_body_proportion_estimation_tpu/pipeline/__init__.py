from human_body_proportion_estimation_tpu.pipeline.full import (  # noqa: F401
    FusedPipeline,
    PipelineOutputs,
)
