"""Serving-artifact export/restore: the Triton model-repo analog."""

import os

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.models.efficientdet import (
    EFFICIENTDET_LITE0,
)
from human_body_proportion_estimation_tpu.pipeline.export import (
    ServingArtifact,
    export_serving_artifact,
)
from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
)
from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    return InferencePipeline(config=cfg, det_config=EFFICIENTDET_LITE0)


def test_export_restore_run_matches_live(tiny_pipeline, tmp_path, rng):
    d = export_serving_artifact(tiny_pipeline, str(tmp_path / "repo"),
                                batch_size=2)
    assert os.path.exists(os.path.join(d, "pipeline.stablehlo"))
    assert os.path.exists(os.path.join(d, "meta.json"))

    art = ServingArtifact(d)
    assert art.batch_size == 2

    imgs = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
            for _ in range(2)]
    live = tiny_pipeline.infer_serving(imgs, 175.0, 0.0)

    batch, thresholds, heights, orig_hw, _ = tiny_pipeline._prepare(
        imgs, 175.0, 0.0
    )
    restored = art(batch, thresholds, heights, orig_hw)
    np.testing.assert_allclose(restored[:2], live, rtol=1e-5, atol=1e-5)
