from human_body_proportion_estimation_tpu.models import hrnet  # noqa: F401
