from human_body_proportion_estimation_tpu.serve.batching import (  # noqa: F401
    DynamicBatcher,
)
