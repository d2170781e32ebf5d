"""perf sweep harness against the in-process tiny server (short window)."""

import threading

import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_server():
    from human_body_proportion_estimation_tpu.serve.server import (
        ServingApp,
        create_server,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
        ServeConfig,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
        serve=ServeConfig(max_batch=4, batch_timeout_ms=3),
    )
    from tests.tiny_models import make_tiny_pipeline

    app = ServingApp(make_tiny_pipeline(cfg=cfg))
    server = create_server(app, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address[1]
    server.shutdown()
    app.shutdown()


def test_sweep_produces_levels(tiny_server):
    from human_body_proportion_estimation_tpu.serve.perf import run_sweep

    results = run_sweep(
        f"http://127.0.0.1:{tiny_server}", "1:2:1", seconds=2.0,
        warmup_requests=2, input_hw=(64, 64),
    )
    assert [r["concurrency"] for r in results] == [1, 2]
    for r in results:
        assert r["requests"] > 0
        assert r["errors"] == 0
        assert r["latency_ms_p95"] >= r["latency_ms_p50"] > 0
        assert r["throughput_rps"] > 0


def test_grpc_sweep_produces_levels(tiny_server_with_grpc):
    from human_body_proportion_estimation_tpu.serve.perf import (
        run_grpc_sweep,
    )

    results = run_grpc_sweep(
        f"127.0.0.1:{tiny_server_with_grpc}", "1:2:1", seconds=2.0,
        warmup_requests=1, input_hw=(64, 64),
    )
    assert [r["concurrency"] for r in results] == [1, 2]
    assert all(r["transport"] == "grpc" for r in results)
    assert all(r["errors"] == 0 for r in results)


import pytest as _pytest


@_pytest.fixture(scope="module")
def tiny_server_with_grpc():
    import threading

    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        create_grpc_server,
    )
    from human_body_proportion_estimation_tpu.serve.server import ServingApp
    from human_body_proportion_estimation_tpu.utils.config import (
        DetectorConfig,
        PipelineConfig,
        PoseConfig,
        ServeConfig,
    )

    cfg = PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
        serve=ServeConfig(max_batch=4, batch_timeout_ms=3),
    )
    from tests.tiny_models import make_tiny_pipeline

    app = ServingApp(make_tiny_pipeline(cfg=cfg))
    server, port = create_grpc_server(app, "127.0.0.1", 0)
    server.start()
    yield port
    server.stop(0)
    app.shutdown()


def test_model_infer_sweep(tiny_server_with_grpc):
    """perf_analyzer -m <model> parity: metadata-driven random inputs,
    tensor-level ModelInfer concurrency sweep against the named hrnet
    model."""
    from human_body_proportion_estimation_tpu.serve.perf import (
        run_model_sweep,
    )

    results = run_model_sweep(
        f"127.0.0.1:{tiny_server_with_grpc}", "hrnet", "1:2:1",
        seconds=2.0, warmup_requests=1,
    )
    assert [r["concurrency"] for r in results] == [1, 2]
    for r in results:
        assert r["transport"] == "grpc_model_infer"
        assert r["model"] == "hrnet"
        assert r["errors"] == 0
        assert r["requests"] > 0
        assert r["latency_ms_p95"] >= r["latency_ms_p50"] > 0
        # server-side counters per pass (perf_analyzer reads these from
        # get_inference_statistics): every client request was served,
        # coalescing means launches <= rows
        assert r["server_inference_count"] >= r["requests"]
        assert 0 < r["server_execution_count"] <= r["server_inference_count"]
        assert r["batching_ratio"] >= 1.0
