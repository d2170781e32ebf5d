from human_body_proportion_estimation_tpu.ops import (  # noqa: F401
    boxes,
    crop,
    heatmap,
    image,
    nms,
    proportions,
)
