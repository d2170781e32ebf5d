"""Bottom-up pipeline behind the real HTTP serving edge.

The same stdlib server / batcher stack that serves the top-down pipeline
(tests/test_serve.py) must serve the detector-free bottom-up pipeline
interchangeably: same route, forms, and response JSON contract as the
reference edge (`uvicorn_server/server.py:85-119`), same packed [n, P, 23]
device readback layout.
"""

import http.client
import json
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def bu_server():
    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )
    from human_body_proportion_estimation_tpu.serve.server import (
        ServingApp,
        create_server,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        PipelineConfig,
        ServeConfig,
    )

    cfg = PipelineConfig(serve=ServeConfig(max_batch=4, batch_timeout_ms=5))
    from tests.tiny_models import tiny_higherhrnet

    pipe = BottomUpPipeline(cfg, model=tiny_higherhrnet())
    pipe.INPUT_HW = (128, 128)  # tiny input for CPU tests
    app = ServingApp(pipe)
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


def _multipart(fields):
    boundary = "testboundary"
    parts = []
    for name, (filename, data) in fields.items():
        head = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            head += f'; filename="{filename}"'
        parts.append(
            f"--{boundary}\r\n{head}\r\n\r\n".encode()
            + (data if isinstance(data, bytes) else str(data).encode())
            + b"\r\n"
        )
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_bottomup_http_contract(bu_server):
    port, jpg = bu_server
    body, ctype = _multipart({
        "file": ("img.jpg", jpg),
        "person_height_in_cm": (None, 175),
        "threshold": (None, 0.7),
    })
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/body_proportion_length_estimation_file",
                 body=body, headers={"Content-Type": ctype})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert set(data) == {"code", "msg", "body_proportion_lengths_(cm)"}
    assert data["code"] == "success"
    # random weights: either no detection or a full 11-segment dict
    if data["msg"] != "No humans detected":
        assert data["msg"] == "human body proportion estimation complete"


def test_bottomup_health_reports_pose_weights(bu_server):
    port, _ = bu_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert data["weights"] == {"pose": "random"}


def test_bottomup_garbage_bytes_never_500(bu_server):
    port, _ = bu_server
    body, ctype = _multipart({"file": ("x.jpg", b"not an image")})
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/body_proportion_length_estimation_file",
                 body=body, headers={"Content-Type": ctype})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert data["code"] == "failed"
