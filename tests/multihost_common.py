"""Shared fixtures for the multi-host serving test: the tiny pipeline
config and the deterministic batch, used identically by the in-process
single-device reference and the spawned multi-process workers."""

import numpy as np


def tiny_config():
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    return cfg, EFFICIENTDET_LITE0


def make_batch(b: int = 8):
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (b, 128, 128, 3), dtype=np.uint8)
    thresholds = np.zeros((b,), np.float32)
    heights = np.full((b, 3), 175.0, np.float32)
    orig_hw = np.full((b, 2), 200.0, np.float32)
    return batch, thresholds, heights, orig_hw
