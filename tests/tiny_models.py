"""Depth-reduced model configs for machinery-level suite tests.

`tiny_w32_config()` keeps HRNet-W32's full four-branch architecture and
branch channel widths (32..256 — so tensor-parallel partitioning rules
still fire on real conv axes and every fuse/transition path is built) but
runs one module per stage and one block per branch: ~10x fewer layers to
XLA-compile and execute on the suite's single CPU core. The same recipe
certifies the multi-chip dryrun (`__graft_entry__.py` phase 1).

Use these in tests that certify *machinery* (sharded train steps, dp
serving equality, overfit loops); full-scale model evidence lives in the
real-chip certification (`cli/certify.py`, BENCHMARKS.md) and the
architecture tests (`test_model_hrnet.py`'s param-count checks).
"""

import dataclasses


def tiny_w32_config():
    from human_body_proportion_estimation_tpu.models.hrnet import HRNET_W32

    return dataclasses.replace(
        HRNET_W32, stage_modules=(1, 1, 1), blocks_per_branch=1
    )


def tiny_hrnet(dtype=None):
    """Depth-reduced HRNet instance for the top-down pose slot
    (`InferencePipeline(pose=...)`): same heatmap contract (K channels at
    crop/4), ~10x fewer layers than the default full-depth W32."""
    from human_body_proportion_estimation_tpu.models.hrnet import HRNet

    kw = {} if dtype is None else {"dtype": dtype}
    return HRNet(config=tiny_w32_config(), **kw)


def tiny_edet_config():
    """Depth-reduced EfficientDet for machinery tests: LITE0 backbone at
    depth_mult 0.1 (middle stages collapse to one block), single FPN /
    head repeat. Same anchor/decode contract as the full architectures."""
    import dataclasses as dc

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
    )

    return dc.replace(
        EFFICIENTDET_LITE0,
        backbone=dc.replace(EFFICIENTDET_LITE0.backbone, depth_mult=0.1),
        fpn_repeats=1,
        head_repeats=1,
    )


def make_tiny_pipeline(cfg=None, mesh=None, rng_seed=0):
    """The canonical machinery-test pipeline: tiny shapes (128x128 det,
    64x64 crop, 16x16 heatmap) AND depth-reduced models. Because every
    module builds the identical architecture, the fused program's HLO is
    identical suite-wide — one cold XLA compile per batch bucket serves
    test_serve/test_grpc_serve/test_cli/test_export_artifact/... via the
    persistent cache instead of one per module."""
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
    )

    if cfg is None:
        cfg = PipelineConfig(
            detector=DetectorConfig(input_height=128, input_width=128),
            pose=PoseConfig(crop_height=64, crop_width=64,
                            heatmap_height=16, heatmap_width=16),
        )
    return InferencePipeline(
        config=cfg, det_config=tiny_edet_config(), pose=tiny_hrnet(),
        mesh=mesh, rng_seed=rng_seed,
    )


def tiny_higherhrnet(dtype=None):
    """Depth-reduced HigherHRNet for bottom-up machinery tests (same
    branches/channels/deconv head as the full model, ~10x fewer layers).
    Pass to `BottomUpPipeline(model=...)`."""
    from human_body_proportion_estimation_tpu.models.higherhrnet import (
        HigherHRNet,
    )

    kw = {} if dtype is None else {"dtype": dtype}
    return HigherHRNet(config=tiny_w32_config(), **kw)
