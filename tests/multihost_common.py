"""Shared fixtures for the multi-host serving test: the tiny pipeline
config and the deterministic batch, used identically by the in-process
single-device reference and the spawned multi-process workers."""

import numpy as np


def tiny_config():
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
    )
    from tests.tiny_models import tiny_edet_config

    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    return cfg, tiny_edet_config()


def pipeline_kwargs():
    """Identical InferencePipeline/make_multihost_pipeline kwargs for the
    in-process reference and every spawned worker (determinism contract:
    same seed + same architecture => identical replicated params).
    Depth-reduced models: the property under test is multi-process
    lockstep equality, which is architecture-depth-independent — and the
    workers' XLA:CPU compile of the fused program dominated the old test
    wall time."""
    from tests.tiny_models import tiny_hrnet

    cfg, det_cfg = tiny_config()
    return dict(config=cfg, det_config=det_cfg, rng_seed=0,
                pose=tiny_hrnet())


def make_batch(b: int = 8):
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (b, 128, 128, 3), dtype=np.uint8)
    thresholds = np.zeros((b,), np.float32)
    heights = np.full((b, 3), 175.0, np.float32)
    orig_hw = np.full((b, 2), 200.0, np.float32)
    return batch, thresholds, heights, orig_hw
