"""gRPC edge: wire-format roundtrip + live service against tiny pipeline."""

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.serve.grpc_server import (
    decode_request,
    encode_request,
)


def test_wire_format_roundtrip():
    img = b"\x00\x01\xffjpegbytes"
    data = encode_request(img, 193.0, 0.55)
    out_img, height, threshold = decode_request(data)
    assert out_img == img
    assert height == pytest.approx(193.0)
    assert threshold == pytest.approx(0.55)


def test_wire_format_truncation_rejected():
    with pytest.raises(ValueError):
        decode_request(b"\x01\x02")
    good = encode_request(b"abcdef", 175, 0.7)
    with pytest.raises(ValueError):
        decode_request(good[:-2])


@pytest.fixture(scope="module")
def grpc_app():
    import cv2

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
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
    app = ServingApp(InferencePipeline(config=cfg,
                                       det_config=EFFICIENTDET_LITE0))
    server, port = create_grpc_server(app, "127.0.0.1", 0)
    server.start()

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    yield port, enc.tobytes()
    server.stop(0)
    app.shutdown()


def test_grpc_estimate_contract(grpc_app):
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
    )

    port, jpg = grpc_app
    client = GrpcClient(f"127.0.0.1:{port}")
    resp = client.estimate(jpg, 175, 0.7)
    assert resp["code"] == "success"
    assert "body_proportion_lengths_(cm)" in resp
    health = client.health()
    assert health["status"] == "ok"
    client.close()


def test_grpc_bad_payload_fails_cleanly(grpc_app):
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        GrpcClient,
    )

    port, _ = grpc_app
    client = GrpcClient(f"127.0.0.1:{port}")
    resp = client.estimate(b"not an image", 175, 0.7)
    assert resp["code"] == "failed"
    client.close()
