"""Serving-artifact export/restore: the Triton model-repo analog."""

import os

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


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
    # canonical tiny shapes + depth-reduced models (tests/tiny_models.py)
    from tests.tiny_models import make_tiny_pipeline

    return make_tiny_pipeline()


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


@pytest.fixture(scope="module")
def artifact_dir(tiny_pipeline, tmp_path_factory):
    return export_serving_artifact(
        tiny_pipeline,
        str(tmp_path_factory.mktemp("artifact") / "repo"),
        batch_size=2,
    )


def test_artifact_pipeline_chunks_oversize_batches(artifact_dir, rng):
    """5 images through a batch-2 artifact: chunked 2+2+1, identical rows
    for identical inputs regardless of which chunk they land in."""
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
    )

    pipe = ArtifactPipeline(artifact_dir)
    assert pipe.config.detector.input_height == 128  # restored from meta
    img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    out = pipe.infer_serving([img] * 5, person_heights=175.0,
                             det_threshold=0.0)
    assert out.shape[0] == 5
    for i in range(1, 5):
        np.testing.assert_array_equal(out[i], out[0])

    # per-request forms also line up across chunk boundaries
    out2 = pipe.infer_serving(
        [img] * 3,
        person_heights=[[150.0], [175.0], [150.0]],
        det_threshold=[0.0, 0.0, 0.0],
    )
    np.testing.assert_array_equal(out2[0], out2[2])


def test_serving_app_on_artifact(artifact_dir, rng):
    """The HTTP edge serves from a restored artifact with no model code:
    the --artifact-dir path (Triton model-repository load analog)."""
    import cv2

    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
    )
    from human_body_proportion_estimation_tpu.serve.server import ServingApp

    pipe = ArtifactPipeline(artifact_dir)
    assert pipe.weights_origin == {"detector": "random", "pose": "random"}
    app = ServingApp(pipe)
    try:
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        class _Part:
            def __init__(self, data):
                self.data = data
                self.filename = None

        resp = app.handle_estimation({
            "file": _Part(enc.tobytes()),
            "person_height_in_cm": _Part(b"175"),
            "threshold": _Part(b"0.0"),
        })
        assert resp["code"] == "success"
        assert "body_proportion_lengths_(cm)" in resp
        # the stage split is wired through the artifact path too
        assert "host_prepare" in app.stages.snapshot()
    finally:
        app.shutdown()


def test_prewarm_on_artifact_pipeline(artifact_dir):
    """prewarm_serving works on the artifact-restored pipeline too: one
    pass at its single fixed batch size warms the restored program."""
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        prewarm_serving,
    )

    pipe = ArtifactPipeline(artifact_dir)
    warmed = prewarm_serving(pipe)
    assert warmed == [1, 2]  # buckets 1 then batch_size=2
    assert pipe.prewarmed is True


def test_bottomup_export_restore_matches_live(tmp_path, rng):
    """Bottom-up artifact (mode=bottom_up in meta): restore must reproduce
    the live BottomUpPipeline's packed rows, and the ArtifactPipeline edge
    surface must serve it (no detector collection on disk)."""
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
        export_serving_artifact,
    )

    from tests.tiny_models import tiny_higherhrnet

    # depth-reduced model: export/restore equality is depth-independent
    live = BottomUpPipeline(model=tiny_higherhrnet())
    live.INPUT_HW = (128, 128)  # tiny input for CPU tests
    d = export_serving_artifact(live, str(tmp_path / "bu"), batch_size=2)
    assert not os.path.exists(os.path.join(d, "det"))

    imgs = [rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
            for _ in range(2)]
    want = live.infer_serving(imgs, person_heights=175.0)

    pipe = ArtifactPipeline(d)
    assert pipe.artifact.mode == "bottom_up"
    assert pipe.weights_origin == {"pose": "random"}
    got = pipe.infer_serving(imgs, person_heights=175.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # chunking across the fixed batch: 3 identical images -> 2+1
    out = pipe.infer_serving([imgs[0]] * 3, person_heights=175.0)
    assert out.shape[0] == 3
    np.testing.assert_array_equal(out[0], out[2])


def test_artifact_format_version_gating(artifact_dir, tmp_path):
    """Restore refuses artifacts written by a NEWER format (the Triton
    config.pbtxt version-gating analog) and fails cleanly on a missing
    directory — no hangs, no partial loads."""
    import json
    import shutil

    from human_body_proportion_estimation_tpu.pipeline.export import (
        ServingArtifact,
    )

    newer = tmp_path / "newer"
    shutil.copytree(artifact_dir, newer)
    meta_path = newer / "meta.json"
    meta = json.loads(meta_path.read_text())
    assert meta["format_version"] == 1
    meta["format_version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version 99"):
        ServingArtifact(str(newer))

    with pytest.raises(FileNotFoundError):
        ServingArtifact(str(tmp_path / "does-not-exist"))


def test_grpc_edge_on_artifact(artifact_dir, rng):
    """The gRPC endpoint serves from a restored artifact too (the edge
    only needs the infer_serving surface)."""
    import cv2

    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
    )
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
        create_grpc_server,
    )
    from human_body_proportion_estimation_tpu.serve.server import ServingApp

    app = ServingApp(ArtifactPipeline(artifact_dir))
    server, port = create_grpc_server(app, "127.0.0.1", 0)
    server.start()
    try:
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        client = GrpcClient(f"127.0.0.1:{port}")
        resp = client.estimate(enc.tobytes(), 175, 0.0)
        assert resp["code"] == "success"
        assert "body_proportion_lengths_(cm)" in resp
        client.close()
    finally:
        server.stop(0)
        app.shutdown()


def test_yolo_backend_export_restore_matches_live(tmp_path, rng):
    """The artifact path covers the YOLO detector slot too (backend-generic
    forward_serving: letterbox -> decode -> NMS all in-graph)."""
    from human_body_proportion_estimation_tpu.pipeline.backends import (
        YoloBackend,
    )
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(name="yolov5s", input_height=128,
                                input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
    )
    from tests.tiny_models import tiny_hrnet

    live = InferencePipeline(
        config=cfg, backend=YoloBackend(cfg, variant="yolov5s",
                                        input_size=128),
        pose=tiny_hrnet(),
    )
    d = export_serving_artifact(live, str(tmp_path / "yolo"), batch_size=2)

    imgs = [rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
            for _ in range(2)]
    want = live.infer_serving(imgs, 175.0, 0.0)
    pipe = ArtifactPipeline(d)
    got = pipe.infer_serving(imgs, 175.0, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_artifact_dp_sharded_matches_single_device(artifact_dir, rng):
    """mesh= restores the SAME StableHLO program shard_map'd over 'data':
    rows must match the single-device restore bit-for-bit (each shard runs
    the identical per-device program), the output must genuinely span all
    mesh devices, and chunking must use the effective batch (2 x 8 = 16)."""
    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
        ServingArtifact,
    )

    mesh = make_mesh(8)
    single = ArtifactPipeline(artifact_dir)
    sharded = ArtifactPipeline(artifact_dir, mesh=mesh)
    assert sharded.artifact.effective_batch == 16

    imgs = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
            for _ in range(5)]
    want = single.infer_serving(imgs, person_heights=175.0,
                                det_threshold=0.0)
    got = sharded.infer_serving(imgs, person_heights=175.0,
                                det_threshold=0.0)
    np.testing.assert_array_equal(got, want)

    # the raw call output is really sharded over the mesh, not replicated
    art = ServingArtifact(artifact_dir, mesh=mesh)
    batch = np.zeros((16, 128, 128, 3), np.uint8)
    out = art._sharded_call(
        art.det_vars, art.pose_vars, batch,
        np.full((16,), 0.99, np.float32),
        np.full((16, art.meta["max_persons"]), 175.0, np.float32),
        np.full((16, 2), 128.0, np.float32),
    )
    assert len(out.sharding.device_set) == 8


def test_bottomup_artifact_dp_sharded_matches_single(tmp_path, rng):
    """Bottom-up artifacts dp-shard the same way (one weight arg, three
    batch args)."""
    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ArtifactPipeline,
        export_serving_artifact,
    )

    from tests.tiny_models import tiny_higherhrnet

    live = BottomUpPipeline(model=tiny_higherhrnet())
    live.INPUT_HW = (128, 128)
    d = export_serving_artifact(live, str(tmp_path / "bu"), batch_size=1)

    imgs = [rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
            for _ in range(3)]
    single = ArtifactPipeline(d)
    sharded = ArtifactPipeline(d, mesh=make_mesh(4))
    assert sharded.artifact.effective_batch == 4
    want = single.infer_serving(imgs, person_heights=175.0)
    got = sharded.infer_serving(imgs, person_heights=175.0)
    np.testing.assert_array_equal(got, want)
