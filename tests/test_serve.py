"""Serving layer: dynamic batcher semantics + HTTP edge contract.

The HTTP tests run the real stdlib server in-process against the tiny
random-weight pipeline (no TPU needed) — the "fake engine" strategy from
SURVEY §4's gap analysis.
"""

import http.client
import io
import json
import threading
import time
import uuid

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.serve.batching import DynamicBatcher
from human_body_proportion_estimation_tpu.serve.http import parse_multipart


# --------------------------------------------------------------------- #
# batcher


def test_batcher_coalesces_and_preserves_order():
    seen_batches = []

    def runner(payloads):
        seen_batches.append(len(payloads))
        time.sleep(0.01)
        return [p * 10 for p in payloads]

    b = DynamicBatcher(runner, max_batch=4, batch_timeout_ms=30)
    futs = [b.submit(i) for i in range(8)]
    results = [f.result(5) for f in futs]
    assert results == [i * 10 for i in range(8)]
    assert sum(seen_batches) == 8
    assert max(seen_batches) >= 2  # some coalescing happened
    b.shutdown()


def test_batcher_propagates_runner_failure():
    def runner(payloads):
        raise RuntimeError("boom")

    b = DynamicBatcher(runner, max_batch=2, batch_timeout_ms=1)
    fut = b.submit(1)
    with pytest.raises(RuntimeError, match="boom"):
        fut.result(5)
    assert b.metrics.snapshot()["failures_total"] == 1
    b.shutdown()


def test_batcher_timeout_launches_partial_batch():
    def runner(payloads):
        return payloads

    b = DynamicBatcher(runner, max_batch=64, batch_timeout_ms=5)
    t0 = time.perf_counter()
    assert b.submit("x").result(5) == "x"
    assert time.perf_counter() - t0 < 2.0  # didn't wait for a full batch
    b.shutdown()


# --------------------------------------------------------------------- #
# multipart parsing


def _multipart_body(fields):
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    for name, (data, filename) in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        out.write(disp.encode() + b"\r\n\r\n")
        out.write(data if isinstance(data, bytes) else str(data).encode())
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_parse_multipart_roundtrip():
    body, ctype = _multipart_body({
        "file": (b"\x00\x01binary\xff", "img.jpg"),
        "person_height_in_cm": ("193", None),
    })
    parts = parse_multipart(body, ctype)
    assert parts["file"].data == b"\x00\x01binary\xff"
    assert parts["file"].filename == "img.jpg"
    assert parts["person_height_in_cm"].data == b"193"
    assert parts["person_height_in_cm"].filename is None


def test_parse_multipart_malformed():
    with pytest.raises(ValueError):
        parse_multipart(b"garbage", "text/plain")


# --------------------------------------------------------------------- #
# HTTP edge (real server, tiny pipeline)


@pytest.fixture(scope="module")
def served_app():
    import cv2

    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
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
        serve=ServeConfig(max_batch=4, batch_timeout_ms=5),
    )
    from tests.tiny_models import make_tiny_pipeline

    pipeline = make_tiny_pipeline(cfg=cfg)
    app = ServingApp(pipeline)
    server = create_server(app, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok

    yield port, enc.tobytes()
    server.shutdown()
    app.shutdown()


def _post(port, path, body, ctype):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": ctype})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def _post_json(port, path, doc):
    return _post(port, path, json.dumps(doc).encode(), "application/json")


def test_index_route(served_app):
    port, _ = served_app
    status, data = _get(port, "/")
    assert status == 200
    assert "Welcome to Human Body Proportion Estimation Web Service" in data


def test_estimation_route_contract(served_app):
    port, jpg = served_app
    body, ctype = _multipart_body({
        "file": (jpg, "person.jpg"),
        "person_height_in_cm": ("193", None),
        "threshold": ("0.7", None),
    })
    status, data = _post(
        port, "/body_proportion_length_estimation_file", body, ctype
    )
    assert status == 200
    assert data["code"] == "success"
    assert "body_proportion_lengths_(cm)" in data
    assert data["msg"] in (
        "No humans detected",
        "human body proportion estimation complete",
    )


def test_estimation_bad_image_never_500(served_app):
    port, _ = served_app
    body, ctype = _multipart_body({"file": (b"not an image", "x.jpg")})
    status, data = _post(
        port, "/body_proportion_length_estimation_file", body, ctype
    )
    assert status == 200  # parity: reference returns 200 with failed code
    assert data["code"] == "failed"


def test_estimation_missing_file_fails_cleanly(served_app):
    port, _ = served_app
    body, ctype = _multipart_body({"threshold": ("0.5", None)})
    status, data = _post(
        port, "/body_proportion_length_estimation_file", body, ctype
    )
    assert data["code"] == "failed"


def _encode_test_video(n_frames=6, wh=(64, 64), fps=5.0):
    import os
    import tempfile

    import cv2

    rng = np.random.default_rng(3)
    path = tempfile.mktemp(suffix=".avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, wh)
    assert w.isOpened()
    for _ in range(n_frames):
        w.write(rng.integers(0, 256, (wh[1], wh[0], 3), dtype=np.uint8))
    w.release()
    with open(path, "rb") as f:
        data = f.read()
    os.unlink(path)
    return data


def test_video_estimation_route(served_app):
    port, _ = served_app
    video = _encode_test_video(n_frames=6)
    body, ctype = _multipart_body({
        "file": (video, "clip.avi"),
        "person_height_in_cm": ("180", None),
        "frame_stride": ("2", None),
    })
    status, data = _post(
        port, "/body_proportion_length_estimation_video", body, ctype
    )
    assert status == 200
    assert data["code"] == "success"
    assert data["num_frames_processed"] == 3  # 6 frames, stride 2
    assert [f["frame"] for f in data["frames"]] == [0, 2, 4]
    for f in data["frames"]:
        assert "body_proportion_lengths_(cm)" in f
    assert "median_body_proportion_lengths_(cm)" in data
    assert data["fps"] == pytest.approx(5.0, abs=0.1)
    assert data["msg"] in (
        "No humans detected",
        "human body proportion estimation complete",
    )


def test_video_estimation_max_frames(served_app):
    port, _ = served_app
    video = _encode_test_video(n_frames=6)
    body, ctype = _multipart_body({
        "file": (video, "clip.avi"),
        "max_frames": ("2", None),
    })
    status, data = _post(
        port, "/body_proportion_length_estimation_video", body, ctype
    )
    assert status == 200 and data["code"] == "success"
    assert data["num_frames_processed"] == 2
    assert [f["frame"] for f in data["frames"]] == [0, 1]


def test_video_estimation_bad_video_never_500(served_app):
    port, _ = served_app
    body, ctype = _multipart_body({"file": (b"not a video", "x.avi")})
    status, data = _post(
        port, "/body_proportion_length_estimation_video", body, ctype
    )
    assert status == 200
    assert data["code"] == "failed"


def test_stream_video_bytes_strides_and_cleans_up(tmp_path):
    import glob
    import tempfile

    from human_body_proportion_estimation_tpu.utils.io import (
        stream_video_bytes,
    )

    video = _encode_test_video(n_frames=5, wh=(32, 32))
    before = set(glob.glob(tempfile.gettempdir() + "/*.video"))
    frames, fps = stream_video_bytes(video, frame_stride=2)
    got = list(frames)
    assert len(got) == 3  # frames 0, 2, 4
    assert got[0].shape == (32, 32, 3) and got[0].dtype == np.uint8
    assert fps == pytest.approx(5.0, abs=0.1)
    # the temp file backing cv2.VideoCapture is unlinked on exhaustion
    assert set(glob.glob(tempfile.gettempdir() + "/*.video")) == before

    with pytest.raises(ValueError):
        stream_video_bytes(video, frame_stride=0)


def test_http_client_sdk(served_app):
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, jpg = served_app
    c = HttpClient("127.0.0.1", port)
    r = c.estimate_image(jpg, person_height_cm=193, det_threshold=0.6)
    assert r["_http_status"] == 200 and r["code"] == "success"
    assert "body_proportion_lengths_(cm)" in r

    v = c.estimate_video(_encode_test_video(n_frames=4), frame_stride=2)
    assert v["code"] == "success" and v["num_frames_processed"] == 2

    h = c.health()
    assert h["status"] == "ok"
    m = c.metrics()
    assert m["requests_total"] >= 1
    d = c.docs()
    assert "/body_proportion_length_estimation_video" in d["paths"]


def test_metrics_and_health(served_app):
    port, jpg = served_app
    # issue one request so counters are non-zero regardless of test order
    body, ctype = _multipart_body({"file": (jpg, "p.jpg")})
    _post(port, "/body_proportion_length_estimation_file", body, ctype)

    status, health = _get(port, "/health")
    assert status == 200 and health["status"] == "ok"
    # random-weight guardrail: the tiny test pipeline has no real weights,
    # and /health must say so per model slot
    assert health["weights"] == {"detector": "random", "pose": "random"}
    status, metrics = _get(port, "/metrics")
    assert status == 200
    assert metrics["requests_total"] >= 1
    assert "latency_ms_p95" in metrics
    # per-stage latency split (round-1 review weak #6): decode / host
    # prepare / device upload / device compute+readback must be present
    # with observations so operators can attribute serving latency
    stages = metrics["stages"]
    for key in ("request_decode", "host_prepare", "device_upload",
                "device_compute_readback"):
        assert stages[key]["count"] >= 1, key
        assert stages[key]["mean_ms"] >= 0.0
    # reading /metrics must not trigger the lazy model-registry build —
    # per-model stats appear only once the repository has been touched
    assert "models" not in metrics


def test_concurrent_requests_batched(served_app):
    port, jpg = served_app
    body, ctype = _multipart_body({"file": (jpg, "p.jpg")})
    results = []

    def hit():
        results.append(
            _post(port, "/body_proportion_length_estimation_file", body, ctype)
        )

    threads = [threading.Thread(target=hit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 and d["code"] == "success" for s, d in results)
    _, metrics = _get(port, "/metrics")
    assert metrics["mean_batch_size"] > 1.0  # batching actually engaged


def test_structured_logger(capsys):
    import io

    from human_body_proportion_estimation_tpu.utils.logging import JsonLogger

    buf = io.StringIO()
    log = JsonLogger("t", level="info", stream=buf)
    log.debug("hidden", x=1)
    log.info("visible", n=2, s="a")
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["event"] == "visible" and rec["n"] == 2
    assert rec["level"] == "info" and "ts" in rec


def test_server_survives_runner_failure(served_app, monkeypatch):
    # poison one batch: the response must be the parity failed JSON (no 500)
    # and the server must keep serving afterwards
    port, jpg = served_app
    body, ctype = _multipart_body({"file": (jpg, "p.jpg")})
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    original = InferencePipeline.infer_serving
    calls = {"n": 0}

    def flaky(self, *args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected failure")
        return original(self, *args, **kwargs)

    monkeypatch.setattr(InferencePipeline, "infer_serving", flaky)
    status, data = _post(
        port, "/body_proportion_length_estimation_file", body, ctype
    )
    assert status == 200 and data["code"] == "failed"
    status, data = _post(
        port, "/body_proportion_length_estimation_file", body, ctype
    )
    assert status == 200 and data["code"] == "success"


def test_prewarm_compiles_every_batch_bucket():
    """--prewarm runs the serving program at every power-of-two bucket so
    first requests never stall on XLA compile (Triton READY-after-load
    analog, reference README :56-64); /health then reports prewarmed."""
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
        prewarm_serving,
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
        serve=ServeConfig(max_batch=4),
    )
    from tests.tiny_models import make_tiny_pipeline

    pipeline = make_tiny_pipeline(cfg=cfg)
    assert getattr(pipeline, "prewarmed", False) is False
    warmed = prewarm_serving(pipeline)
    assert warmed == [1, 2, 4]
    assert pipeline.prewarmed is True
    # the serving program cache now holds every bucket's program; a real
    # request at any size executes without adding a new shape
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    out = pipeline.infer_serving([img] * 3, 175.0, 0.0)
    assert out.shape[0] == 3


def test_video_default_frame_cap(served_app, monkeypatch):
    """The AGGREGATE endpoint caps processed frames by default (its JSON
    body materializes every frame); explicit max_frames=0 opts out."""
    from human_body_proportion_estimation_tpu.serve.server import ServingApp

    monkeypatch.setattr(ServingApp, "DEFAULT_MAX_VIDEO_FRAMES", 3)
    port, _ = served_app
    video = _encode_test_video(n_frames=6)
    body, ctype = _multipart_body({"file": (video, "clip.avi")})
    _, data = _post(
        port, "/body_proportion_length_estimation_video", body, ctype
    )
    assert data["num_frames_processed"] == 3  # capped by default

    body, ctype = _multipart_body({
        "file": (video, "clip.avi"), "max_frames": ("0", None),
    })
    _, data = _post(
        port, "/body_proportion_length_estimation_video", body, ctype
    )
    assert data["num_frames_processed"] == 6  # explicit 0 = unlimited


def test_video_stream_endpoint(served_app):
    """NDJSON streaming: header, per-frame lines in order, summary last
    (HTTP twin of the gRPC EstimateVideoStream RPC)."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    video = _encode_test_video(n_frames=6)
    lines = list(HttpClient("127.0.0.1", port).estimate_video_stream(
        video, frame_stride=2
    ))
    header, frames, summary = lines[0], lines[1:-1], lines[-1]
    assert header["code"] == "success" and header["frame_stride"] == 2
    assert [f["frame"] for f in frames] == [0, 2, 4]
    for f in frames:
        assert "body_proportion_lengths_(cm)" in f
    assert summary["num_frames_processed"] == 3
    assert "median_body_proportion_lengths_(cm)" in summary
    assert "frames" not in summary  # already streamed line-by-line


def test_video_stream_garbage_fails_cleanly(served_app):
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    lines = list(HttpClient("127.0.0.1", port).estimate_video_stream(
        b"definitely not a video"
    ))
    assert len(lines) == 1
    assert lines[0]["code"] == "failed"  # single JSON, never a 500


def test_openapi_docs_contract(served_app):
    """/docs serves a real OpenAPI 3 document (the FastAPI auto-docs role,
    uvicorn_server/server.py:122-124), mirrored at /openapi.json, and
    HttpClient.docs() consumes it."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    doc = HttpClient("127.0.0.1", port).docs()
    doc.pop("_http_status")
    assert doc["openapi"].startswith("3.")
    assert doc["info"]["title"]
    for path in (
        "/body_proportion_length_estimation_file",
        "/body_proportion_length_estimation_video",
        "/body_proportion_length_estimation_video_stream",
        "/health", "/metrics", "/v2/models", "/v2/models/{name}", "/docs",
    ):
        assert path in doc["paths"], path
    post = doc["paths"]["/body_proportion_length_estimation_file"]["post"]
    form = post["requestBody"]["content"]["multipart/form-data"]["schema"]
    assert form["required"] == ["file"]
    assert set(form["properties"]) >= {
        "file", "person_height_in_cm", "threshold", "back_url",
    }
    _, alias = _get(port, "/openapi.json")
    assert alias == doc


def test_docs_serves_swagger_ui_html(served_app):
    """/docs returns the interactive Swagger-UI page rendering
    /openapi.json — what a browser gets from the reference's FastAPI
    /docs (uvicorn_server/server.py:122-124)."""
    port, _ = served_app
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/docs")
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/html")
    assert "/openapi.json" in body
    assert "swagger-ui" in body.lower()


def test_v2_logging_and_trace_extensions(served_app, tmp_path,
                                         monkeypatch):
    """Triton logging + trace extensions over HTTP: GET returns the
    settings documents, POST updates them (full doc back), bad updates
    are the 400 {"error"} contract, and a traced domain request appends
    a timestamp record to trace_file."""
    from human_body_proportion_estimation_tpu.serve import tracing
    from human_body_proportion_estimation_tpu.serve.client import HttpClient
    from human_body_proportion_estimation_tpu.utils.logging import (
        configure_logging,
        log_settings,
    )

    tracer = tracing.RequestTracer()
    monkeypatch.setattr(tracing, "TRACER", tracer)
    log_before = log_settings()
    port, jpg = served_app
    client = HttpClient("127.0.0.1", port)
    try:
        assert set(client.server_metadata()["extensions"]) >= {
            "logging", "trace"}

        doc = client.get_log_settings()
        assert doc["log_info"] is True and doc["log_verbose_level"] == 0
        out = client.update_log_settings({"log_verbose_level": 1})
        assert out["_http_status"] == 200 and out["log_verbose_level"] == 1
        assert client.update_log_settings(
            {"nope": True})["_http_status"] == 400
        assert client.update_log_settings(
            {"log_format": "rfc3339"})["_http_status"] == 400

        tdoc = client.get_trace_settings()
        assert tdoc["trace_level"] == ["OFF"]
        trace_file = str(tmp_path / "trace.json")
        out = client.update_trace_settings({
            "trace_level": ["TIMESTAMPS"], "trace_rate": 1,
            "trace_file": trace_file,
        })
        assert out["_http_status"] == 200
        assert out["trace_rate"] == "1"  # Triton string-valued doc
        assert client.update_trace_settings(
            {"trace_rate": 0})["_http_status"] == 400

        # a domain request through the batcher gets traced
        resp = client.estimate_image(jpg)
        assert resp["code"] == "success"
        tracer.flush()
        recs = [json.loads(ln) for ln in open(trace_file,
                                              encoding="utf-8")]
        assert len(recs) >= 1
        ts = recs[0]["timestamps"]
        assert ts["QUEUE_START"] <= ts["COMPUTE_START"] <= \
            ts["COMPUTE_END"]
    finally:
        configure_logging(log_before)


def test_v2_health_and_model_config(served_app):
    """KServe-v2 surface: /v2/health/live|ready (tritonclient
    is_server_live/ready), model version in index/metadata (Triton's
    `<name>/1/` dir layout), and /v2/models/<name>/config fetched
    separately from metadata (reference triton_utils.py:21-31)."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    client = HttpClient("127.0.0.1", port)
    assert client.live() is True
    assert client.ready() is True

    idx = client.models()
    assert all(m["version"] == "1" for m in idx["models"])

    meta = client.model_metadata("hrnet")
    assert meta["versions"] == ["1"]
    via_version = client.model_metadata("hrnet", version="1")
    via_version.pop("_http_status")
    meta2 = dict(meta)
    meta2.pop("_http_status")
    assert via_version == meta2

    cfg = client.model_config("hrnet")
    assert cfg["_http_status"] == 200
    assert cfg["max_batch_size"] == 4
    assert cfg["input"][0]["dims"] == [3, 64, 64]  # batch dim excluded
    assert cfg["input"][0]["format"] == "FORMAT_NONE"
    assert cfg["instance_group"] == [{"count": 1, "kind": "KIND_MODEL"}]
    assert cfg["dynamic_batching"]["preferred_batch_size"] == [4]

    # unknown version / model / trailing segment -> 404, never 500
    assert client.model_metadata("hrnet", version="2")["_http_status"] == 404
    assert client.model_config("nope")["_http_status"] == 404
    status, _ = _get(port, "/v2/models/hrnet/bogus")
    assert status == 404


def test_v2_repository_extension(served_app):
    """Triton's model-repository HTTP extension: POST
    /v2/repository/index and POST /v2/repository/models/<name>/load|
    unload (the routes tritonclient.http drives; reference runs stock
    Triton, README.md:47-80)."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    client = HttpClient("127.0.0.1", port)

    rows = client.get_model_repository_index()
    names = {r["name"] for r in rows}
    assert "hrnet" in names and "ensemble_edet4_person_det_pose" in names
    assert all(set(r) == {"name", "version", "state", "reason"}
               for r in rows)
    assert all(r["state"] == "READY" for r in rows)
    assert client.get_model_repository_index(ready=True) == rows

    # load -> loaded; unload -> released (model stays registered)
    client.load_model("hrnet")
    idx = {m["name"]: m for m in client.models()["models"]}
    assert idx["hrnet"]["loaded"] is True
    client.unload_model("hrnet")
    idx = {m["name"]: m for m in client.models()["models"]}
    assert idx["hrnet"]["loaded"] is False

    # unload_dependents parameter: the ensemble's composing models are
    # unloaded with it, untouched without it
    client.load_model("hrnet")
    client.unload_model("ensemble_edet4_person_det_pose")
    idx = {m["name"]: m for m in client.models()["models"]}
    assert idx["hrnet"]["loaded"] is True
    client.unload_model("ensemble_edet4_person_det_pose",
                        unload_dependents=True)
    idx = {m["name"]: m for m in client.models()["models"]}
    assert idx["hrnet"]["loaded"] is False

    # unknown model -> the extension's 400 {"error": ...}
    for action in ("load", "unload"):
        status, doc = _post_json(
            port, f"/v2/repository/models/ghost/{action}", {})
        assert status == 400 and "error" in doc
    with pytest.raises(RuntimeError):
        client.load_model("ghost")
    # malformed index body -> 400
    status, doc = _post_json(port, "/v2/repository/index", [1, 2])
    assert status == 400 and "error" in doc
    # unknown repository subroute -> 404
    status, _ = _post_json(port, "/v2/repository/bogus", {})
    assert status == 404


def test_v2_server_metadata_ready_and_stats(served_app):
    """Remaining tritonclient introspection surface: GET /v2 server
    metadata (get_server_metadata), /v2/models/<name>/ready
    (is_model_ready), and /v2/models[/<name>]/stats
    (get_inference_statistics)."""
    from human_body_proportion_estimation_tpu import __version__
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    client = HttpClient("127.0.0.1", port)

    meta = client.server_metadata()
    assert meta["name"] == "human_body_proportion_estimation_tpu"
    assert meta["version"] == __version__
    assert "model_repository" in meta["extensions"]
    assert "statistics" in meta["extensions"]

    assert client.model_ready("hrnet") is True
    assert client.model_ready("hrnet", version="1") is True
    assert client.model_ready("nope") is False
    assert client.model_ready("hrnet", version="2") is False

    # all-models form lists every registered model; counters stay zeroed
    # until tensor-level inference happens (counter semantics are covered
    # in tests/test_model_registry.py::test_inference_statistics)
    all_stats = client.model_stats()
    names = {m["name"] for m in all_stats["model_stats"]}
    assert "hrnet" in names and "ensemble_edet4_person_det_pose" in names
    one = client.model_stats("hrnet")
    (row,) = one["model_stats"]
    assert row["name"] == "hrnet" and row["version"] == "1"
    assert set(row["inference_stats"]) == {
        "success", "fail", "queue",
        "compute_input", "compute_infer", "compute_output",
    }

    assert client.model_stats("nope")["_http_status"] == 404
    assert client.model_stats("hrnet", version="2")["_http_status"] == 404


def test_v2_http_infer(served_app):
    """KServe-v2 HTTP inference protocol (POST /v2/models/<name>/infer,
    JSON tensors) — the HTTP twin of the gRPC ModelInfer RPC; Triton
    serves the same route next to its gRPC endpoint."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    client = HttpClient("127.0.0.1", port)

    rng = np.random.default_rng(3)
    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    out = client.infer("hrnet", {"input": x}, binary=False)
    assert set(out) == {"output"}
    assert out["output"].shape == (1, 17, 16, 16)
    assert out["output"].dtype == np.float32
    assert np.isfinite(out["output"]).all()

    # deterministic + version path + requested-outputs filter
    again = client.infer("hrnet", {"input": x}, version="1",
                         output_names=["output"], binary=False)
    np.testing.assert_array_equal(out["output"], again["output"])

    # JSON floats round-trip f32 exactly, so the HTTP result is bitwise
    # equal to the tensor the server computed; statistics count the rows
    stats = client.model_stats("hrnet")
    assert stats["model_stats"][0]["inference_count"] >= 2

    # Triton's classification extension on the HTTP route (both
    # transports): output replaced by top-k "value:index" BYTES rows,
    # top-1 index equal to the flat argmax of the plain tensor
    flat = out["output"][0].ravel()
    for binary in (False, True):
        rows = client.infer(
            "hrnet", {"input": x}, output_names=["output"],
            class_counts={"output": 3}, binary=binary,
        )["output"]
        assert rows.shape == (1, 3) and rows.dtype == object
        top = [r.decode() for r in rows[0]]
        vals = [float(s.split(":")[0]) for s in top]
        assert vals == sorted(vals, reverse=True)
        assert int(top[0].split(":")[1]) == int(np.argmax(flat))

    # KServe error contract: 404 unknown model/version, 400 bad input —
    # on BOTH transports (binary errors come back as pure JSON)
    for binary in (False, True):
        with pytest.raises(ValueError, match="404"):
            client.infer("nope", {"input": x}, binary=binary)
        with pytest.raises(ValueError, match="404"):
            client.infer("hrnet", {"input": x}, version="9", binary=binary)
        with pytest.raises(ValueError, match="400"):
            client.infer("hrnet", {"wrong": x}, binary=binary)
    # malformed body straight at the route (no client-side validation)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/v2/models/hrnet/infer", body=b"not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    detail = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "error" in detail


def test_v2_http_infer_binary(served_app):
    """Triton binary_tensor_data extension on the HTTP infer route:
    Inference-Header-Content-Length framing, raw little-endian tensor
    bytes both directions, binary_data_size accounting, and bitwise
    equality with the JSON transport."""
    from human_body_proportion_estimation_tpu.serve.client import HttpClient

    port, _ = served_app
    client = HttpClient("127.0.0.1", port)
    assert "binary_tensor_data" in client.server_metadata()["extensions"]

    rng = np.random.default_rng(7)
    x = rng.random((2, 3, 64, 64), dtype=np.float32)
    ref = client.infer("hrnet", {"input": x}, binary=False)
    out = client.infer("hrnet", {"input": x})  # binary default
    np.testing.assert_array_equal(ref["output"], out["output"])
    assert out["output"].dtype == np.float32

    # explicit output list with per-output binary_data
    out2 = client.infer("hrnet", {"input": x}, output_names=["output"])
    np.testing.assert_array_equal(ref["output"], out2["output"])

    # wire-level framing: header + JSON part + exactly-sized blob
    header = json.dumps({
        "inputs": [{"name": "input", "shape": list(x.shape),
                    "datatype": "FP32",
                    "parameters": {"binary_data_size": x.nbytes}}],
        "parameters": {"binary_data_output": True},
    }).encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(
        "POST", "/v2/models/hrnet/infer", body=header + x.tobytes(),
        headers={"Inference-Header-Content-Length": str(len(header)),
                 "Content-Type": "application/octet-stream"},
    )
    resp = conn.getresponse()
    payload = resp.read()
    jlen = int(resp.getheader("Inference-Header-Content-Length"))
    conn.close()
    assert resp.status == 200
    reply = json.loads(payload[:jlen])
    (t,) = reply["outputs"]
    assert "data" not in t
    nbin = t["parameters"]["binary_data_size"]
    assert nbin == len(payload) - jlen == ref["output"].nbytes
    got = np.frombuffer(payload[jlen:], dtype="<f4").reshape(t["shape"])
    np.testing.assert_array_equal(got, ref["output"])

    # binary input + JSON output (no binary_data_output): data arrays back
    header = json.dumps({
        "inputs": [{"name": "input", "shape": list(x.shape),
                    "datatype": "FP32",
                    "parameters": {"binary_data_size": x.nbytes}}],
    }).encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(
        "POST", "/v2/models/hrnet/infer", body=header + x.tobytes(),
        headers={"Inference-Header-Content-Length": str(len(header))},
    )
    resp = conn.getresponse()
    assert resp.getheader("Inference-Header-Content-Length") is None
    reply = json.loads(resp.read())
    conn.close()
    got = np.asarray(reply["outputs"][0]["data"], np.float32).reshape(
        reply["outputs"][0]["shape"]
    )
    np.testing.assert_array_equal(got, ref["output"])

    # strict sizing errors: wrong binary_data_size, truncated payload,
    # unclaimed trailing bytes — all KServe 400s
    def post_raw(header_doc, blob, hlen=None):
        h = json.dumps(header_doc).encode()
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", "/v2/models/hrnet/infer", body=h + blob,
                  headers={"Inference-Header-Content-Length":
                           str(len(h) if hlen is None else hlen)})
        r = c.getresponse()
        body = json.loads(r.read())
        c.close()
        return r.status, body

    good = {"name": "input", "shape": list(x.shape), "datatype": "FP32",
            "parameters": {"binary_data_size": x.nbytes}}
    st, body = post_raw(
        {"inputs": [dict(good, parameters={"binary_data_size": 13})]},
        x.tobytes())
    assert st == 400 and "binary_data_size" in body["error"]
    st, body = post_raw({"inputs": [good]}, x.tobytes()[:-8])
    assert st == 400 and "truncated" in body["error"]
    st, body = post_raw({"inputs": [good]}, x.tobytes() + b"XX")
    assert st == 400 and "trailing" in body["error"]
    st, body = post_raw({"inputs": [good]}, x.tobytes(), hlen=10 ** 9)
    assert st == 400 and "error" in body
