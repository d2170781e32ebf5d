"""Fused pipeline with the HigherHRNet pose slot (1/2-res heatmaps)."""

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)


@pytest.fixture(scope="module")
def higher_pipeline():
    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(name="higherhrnet", crop_height=64, crop_width=64,
                        heatmap_height=32, heatmap_width=32),
    )
    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNetHeatmaps,
    )
    from tests.tiny_models import tiny_edet_config, tiny_w32_config

    # depth-reduced models: this suite certifies the 1/2-res heatmap
    # contract through the fused pipeline, which is depth-independent
    return InferencePipeline(
        config=cfg, det_config=tiny_edet_config(),
        pose=HigherHRNetHeatmaps(config=tiny_w32_config()),
    )


def test_higherhrnet_pipeline_runs(higher_pipeline, rng):
    img = rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
    out = higher_pipeline.infer_images([img], 175.0, det_threshold=0.0)
    # 1/2-res heatmaps: 64x64 crop -> 32x32 maps
    assert out.kp_scores.shape == (1, 3, 17)
    assert np.all(np.isfinite(np.asarray(out.keypoints)))
    assert out.lengths_cm.shape == (1, 3, 11)
