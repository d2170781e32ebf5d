"""gRPC serving edge (the reference's Triton-gRPC role) + client.

The reference's only model-serving transport is Triton's gRPC endpoint,
driven by `tritonclient` (reference `modules/triton_utils.py`,
requirements.txt:9). This module provides the equivalent native endpoint
for this framework: a real gRPC/HTTP2 service sharing the same ServingApp
(dynamic batcher + fused TPU program) as the HTTP edge.

No protoc python plugin exists in this image, so the service uses gRPC's
generic method handlers with an explicit wire format instead of generated
stubs (the framing below IS the schema):

  /hbpe.Inference/Estimate   unary-unary
      request : little-endian header `<f f I` =
                (person_height_cm f32, det_threshold f32, image_len u32)
                followed by `image_len` bytes of an encoded image
      response: UTF-8 JSON — identical body to the HTTP endpoint
                ({"code", "msg", "body_proportion_lengths_(cm)"})
  /hbpe.Inference/Health     unary-unary, empty request -> UTF-8 JSON

`GrpcClient` wraps the same framing for Python callers (the tritonclient
analog).
"""

from __future__ import annotations

import json
import struct
from concurrent import futures
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from human_body_proportion_estimation_tpu.serve.server import ServingApp

_HEADER = struct.Struct("<ffI")
SERVICE = "hbpe.Inference"


def encode_request(
    image_bytes: bytes, person_height_cm: float = 175.0,
    det_threshold: float = 0.70,
) -> bytes:
    return _HEADER.pack(
        float(person_height_cm), float(det_threshold), len(image_bytes)
    ) + image_bytes


def decode_request(data: bytes):
    if len(data) < _HEADER.size:
        raise ValueError("short gRPC request")
    height, threshold, n = _HEADER.unpack_from(data)
    img = data[_HEADER.size:_HEADER.size + n]
    if len(img) != n:
        raise ValueError("truncated image payload")
    return img, height, threshold


def _identity(b: bytes) -> bytes:
    return b


def create_grpc_server(app: "ServingApp", host: str = "0.0.0.0",
                       port: int = 0, max_workers: int = 16):
    """Returns (grpc.Server, bound_port)."""
    import grpc

    from human_body_proportion_estimation_tpu.pipeline.host import (
        decode_image_bytes,
    )
    from human_body_proportion_estimation_tpu.serve.server import FAIL_MSG

    def estimate(request: bytes, context) -> bytes:
        try:
            img_bytes, height, threshold = decode_request(request)
            image = decode_image_bytes(img_bytes)
            response = app.batcher.infer(
                {"image": image, "height": height, "threshold": threshold}
            )
        except Exception:  # noqa: BLE001 — parity: error JSON, not a trap
            response = {"msg": FAIL_MSG, "code": "failed"}
        return json.dumps(response).encode()

    def health(request: bytes, context) -> bytes:
        import jax

        return json.dumps({
            "status": "ok",
            "devices": [str(d) for d in jax.devices()],
        }).encode()

    handlers = {
        "Estimate": grpc.unary_unary_rpc_method_handler(
            estimate, request_deserializer=_identity,
            response_serializer=_identity,
        ),
        "Health": grpc.unary_unary_rpc_method_handler(
            health, request_deserializer=_identity,
            response_serializer=_identity,
        ),
    }
    server = grpc.server(
        futures.ThreadPoolExecutor(max_workers=max_workers),
        options=[("grpc.max_receive_message_length", 64 * 1024 * 1024)],
    )
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE, handlers),)
    )
    bound = server.add_insecure_port(f"{host}:{port}")
    return server, bound


class GrpcClient:
    """Python client for the gRPC edge (tritonclient analog,
    reference modules/triton_utils.py:11-34)."""

    def __init__(self, target: str = "127.0.0.1:8081"):
        import grpc

        self._channel = grpc.insecure_channel(target)
        self._estimate = self._channel.unary_unary(
            f"/{SERVICE}/Estimate",
            request_serializer=_identity,
            response_deserializer=_identity,
        )
        self._health = self._channel.unary_unary(
            f"/{SERVICE}/Health",
            request_serializer=_identity,
            response_deserializer=_identity,
        )

    def estimate(self, image_bytes: bytes, person_height_cm: float = 175.0,
                 det_threshold: float = 0.70, timeout: float = 600.0) -> dict:
        resp = self._estimate(
            encode_request(image_bytes, person_height_cm, det_threshold),
            timeout=timeout,
        )
        return json.loads(resp)

    def health(self, timeout: float = 30.0) -> dict:
        return json.loads(self._health(b"", timeout=timeout))

    def close(self):
        self._channel.close()
