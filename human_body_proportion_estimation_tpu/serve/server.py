"""HTTP serving edge: the drop-in replacement for the reference's
FastAPI app + Triton deployment, self-contained on the stdlib.

Route/response parity with `uvicorn_server/server.py`:
  POST /body_proportion_length_estimation_file
      multipart form: `file` (image), `person_height_in_cm` (int, default
      175), `threshold` (float, default 0.70), optional `back_url`
      -> {"code", "msg", "body_proportion_lengths_(cm)"} with the exact
      "No humans detected" / "human body proportion estimation complete" /
      catch-all-failure messages (server.py:60-67,114-118); any exception
      returns the "failed" JSON, never a 500.
  GET  /   -> the same welcome JSON (server.py:122-124).

Additions over the reference (observability gaps called out in SURVEY §5):
  GET /health  -> liveness + device info
  GET /metrics -> QPS/latency percentiles/batch occupancy JSON
  POST /body_proportion_length_estimation_video
      multipart form: `file` (video) + the same height/threshold forms,
      optional `frame_stride`/`max_frames`/`back_url` -> per-frame
      person-0 results + a median-across-frames summary. The reference
      handles video only in its CLI drivers (serial batch-1 Triton
      calls, `triton_utils.py:95-127`); here frames stream through the
      same dynamic batcher as image requests at full device batch
      occupancy.

Architecture: request threads decode bytes (CPU-parallel), submit decoded
images to the `DynamicBatcher`, which coalesces them into fused-program
launches on the TPU — replacing Triton's dynamic batching + ensemble
scheduling. The optional `back_url` webhook POST mirrors
`ModelProcessTask.run`'s fire-and-log behavior (server.py:69-82) with the
same (3, 100) timeouts.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List

import numpy as np

from human_body_proportion_estimation_tpu.pipeline.host import (
    InferencePipeline,
    decode_image_bytes,
)
from human_body_proportion_estimation_tpu.serve.batching import (
    DynamicBatcher,
    Metrics,
)
from human_body_proportion_estimation_tpu.serve.http import parse_multipart
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig
from human_body_proportion_estimation_tpu.utils.logging import get_logger

log = get_logger("serve")

FAIL_MSG = (
    "Failed to run inference on image. Please use an image with one fully "
    "visible human."
)
WELCOME = {
    "Welcome to Human Body Proportion Estimation Web Service":
        "Please visit /docs"
}

# /docs: the interactive Swagger-UI page FastAPI auto-serves in the
# reference (uvicorn_server/server.py:122-124 points users here). Same
# approach as FastAPI's get_swagger_ui_html: a tiny HTML shell pulling
# the swagger-ui bundle from the public CDN and rendering /openapi.json.
_SWAGGER_UI_HTML = """<!DOCTYPE html>
<html>
<head>
  <meta charset="utf-8"/>
  <title>Human Body Proportion Estimation - Swagger UI</title>
  <link rel="stylesheet"
        href="https://cdn.jsdelivr.net/npm/swagger-ui-dist@5/swagger-ui.css"/>
</head>
<body>
  <div id="swagger-ui"></div>
  <script src="https://cdn.jsdelivr.net/npm/swagger-ui-dist@5/swagger-ui-bundle.js"></script>
  <script>
    window.onload = () => {
      window.ui = SwaggerUIBundle({
        url: "/openapi.json",
        dom_id: "#swagger-ui",
        presets: [SwaggerUIBundle.presets.apis],
        layout: "BaseLayout",
      });
    };
  </script>
</body>
</html>
"""


class ServingApp:
    """Pipeline + batcher + metrics; handler classes bind to one instance."""

    def __init__(self, pipeline: InferencePipeline,
                 config: PipelineConfig | None = None):
        from human_body_proportion_estimation_tpu.utils.profiling import (
            StageTimer,
        )

        self.pipeline = pipeline
        self.config = config or pipeline.config
        self.metrics = Metrics()
        # per-stage latency split for /metrics: request decode (handler
        # threads), host batch prepare, device upload, device compute +
        # readback (pipeline/host.py infer_serving) — proves where serving
        # time goes (in this sandbox: the tunnel upload; the reference
        # ships no equivalent, Triton metrics disabled)
        self.stages = StageTimer()
        pipeline.stages = self.stages
        self._registry = None
        self._registry_lock = threading.Lock()
        serve_cfg = self.config.serve
        self.native = False
        if serve_cfg.native_batcher:
            try:
                from human_body_proportion_estimation_tpu.serve.native import (
                    NativeBatcher,
                )

                self.batcher = NativeBatcher(
                    self._run_batch,
                    max_batch=serve_cfg.max_batch,
                    batch_timeout_ms=serve_cfg.batch_timeout_ms,
                    queue_depth=serve_cfg.queue_depth,
                )
                self.native = True
            except Exception as e:  # noqa: BLE001 — toolchain missing
                log.warning("native_core_unavailable", error=str(e))
        if not self.native:
            self.batcher = DynamicBatcher(
                self._run_batch,
                max_batch=serve_cfg.max_batch,
                batch_timeout_ms=serve_cfg.batch_timeout_ms,
                queue_depth=serve_cfg.queue_depth,
                metrics=self.metrics,
            )

    @property
    def registry(self):
        """Named-model repository (Triton model-repo role): lazily built
        so domain-endpoint-only deployments pay nothing; shares the
        serving pipeline's loaded params where the models match
        (serve/registry.py). Lock-guarded: concurrent first ModelInfer
        RPCs on the gRPC thread pool must not build two registries (the
        loser's per-model batcher threads/params would leak past
        shutdown)."""
        if getattr(self, "_registry", None) is None:
            with self._registry_lock:
                if getattr(self, "_registry", None) is None:
                    from human_body_proportion_estimation_tpu.serve.registry import (  # noqa: E501
                        build_registry,
                    )

                    self._registry = build_registry(self.pipeline)
        return self._registry

    def metrics_snapshot(self) -> Dict[str, Any]:
        stages = {"stages": self.stages.snapshot()}
        if self._registry is not None:
            # per-named-model stats — only once the repository has been
            # touched (reading /metrics must not trigger its lazy build)
            stages["models"] = self._registry.stats()
        if self.native:
            m = self.batcher.metrics_json()
            # unified key set across engines
            m["requests_total"] = m.get("completed", 0)
            # runner exceptions, matching the Python engine's semantics;
            # back-pressure rejections stay separate under "rejected"
            m["failures_total"] = m.get("failed", 0)
            m["batches_total"] = m.get("batches", 0)
            return {"engine": "native", **m, **stages}
        return {"engine": "python", **self.metrics.snapshot(), **stages}

    def _run_batch(self, payloads: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        from human_body_proportion_estimation_tpu.ops import (
            proportions as prop_ops,
        )

        images = [p["image"] for p in payloads]
        heights = [[p["height"]] for p in payloads]
        thresholds = [p["threshold"] for p in payloads]
        # packed [n, P, 23] = valid | 11 lengths | 11 visibility — a single
        # device readback per batch (tunnel round trips dominate otherwise)
        packed = self.pipeline.infer_serving(
            images, person_heights=heights, det_threshold=thresholds
        )
        responses = []
        for i in range(len(payloads)):
            row = packed[i]
            # first valid person slot (reference serves person 0 only,
            # server.py:61-67)
            slot = next((s for s in range(row.shape[0]) if row[s, 0] > 0.5),
                        None)
            if slot is None:
                responses.append({
                    "code": "success",
                    "msg": "No humans detected",
                    "body_proportion_lengths_(cm)": {},
                })
            else:
                d = prop_ops.to_dist_dict(
                    row[slot, 1:12], row[slot, 12:23] > 0.5
                )
                responses.append({
                    "code": "success",
                    "msg": "human body proportion estimation complete",
                    "body_proportion_lengths_(cm)": d,
                })
        return responses

    def handle_estimation(self, form) -> Dict[str, Any]:
        if "file" not in form:
            raise ValueError("missing 'file' form field")
        height = int(form["person_height_in_cm"].data) \
            if "person_height_in_cm" in form else 175
        threshold = float(form["threshold"].data) \
            if "threshold" in form else 0.70
        back_url = form["back_url"].data.decode() if "back_url" in form else ""

        with self.stages.stage("request_decode"):
            image = decode_image_bytes(form["file"].data)
        response = self.batcher.infer(
            {"image": image, "height": height, "threshold": threshold}
        )
        if back_url:
            self._post_webhook(back_url, response)
        return response

    # frames submitted to the batcher per wave: bounds decoded-frame
    # memory and our share of the batcher queue (leaves room for
    # concurrent image requests to interleave with a long video)
    VIDEO_CHUNK = 64
    # default frame cap for the AGGREGATE video endpoint (one minute at
    # 30 fps): its response materializes every per-frame dict into one
    # JSON body, so an uncapped long upload would build an unbounded
    # response. Explicit max_frames=0 opts out; the _stream endpoint has
    # no cap (it never buffers).
    DEFAULT_MAX_VIDEO_FRAMES = 1800

    def handle_video_estimation(self, form) -> Dict[str, Any]:
        """POST /body_proportion_length_estimation_video.

        Beyond-reference endpoint: the reference processes video only via
        its CLI drivers (`triton_utils.extract_data_from_media`
        :95-127, serial batch-1 Triton calls); its HTTP server takes
        single images. Here video frames stream through the SAME dynamic
        batcher as image requests, so a video upload runs at full device
        batch occupancy while concurrent image requests keep their
        latency guarantees. Per-frame person-0 results (reference
        first-person-only semantics, server.py:61-67) plus a median
        summary across frames — the temporal aggregate a single-image
        API cannot offer.
        """
        if "file" not in form:
            raise ValueError("missing 'file' form field")
        height = int(form["person_height_in_cm"].data) \
            if "person_height_in_cm" in form else 175
        threshold = float(form["threshold"].data) \
            if "threshold" in form else 0.70
        back_url = form["back_url"].data.decode() if "back_url" in form else ""
        frame_stride = int(form["frame_stride"].data) \
            if "frame_stride" in form else 1
        max_frames = int(form["max_frames"].data) \
            if "max_frames" in form else self.DEFAULT_MAX_VIDEO_FRAMES
        response = self.run_video(
            form["file"].data, height, threshold, frame_stride, max_frames
        )
        if back_url:
            self._post_webhook(back_url, response)
        return response

    def open_video_stream_form(self, form):
        """Parse the streaming-endpoint form and open the frame stream.

        Returns (fps, frame_stride, per-frame iterator). Raises before any
        bytes are streamed on bad forms / undecodable video, so the
        handler can still fall back to the single failed-JSON response
        (never-500 parity). No default frame cap: the NDJSON response is
        written incrementally and never buffers.
        """
        if "file" not in form:
            raise ValueError("missing 'file' form field")
        height = int(form["person_height_in_cm"].data) \
            if "person_height_in_cm" in form else 175
        threshold = float(form["threshold"].data) \
            if "threshold" in form else 0.70
        frame_stride = int(form["frame_stride"].data) \
            if "frame_stride" in form else 1
        max_frames = int(form["max_frames"].data) \
            if "max_frames" in form else 0
        fps, it = self.open_video_stream(
            form["file"].data, height, threshold, frame_stride, max_frames
        )
        return fps, frame_stride, it

    def open_video_stream(self, video_bytes: bytes, height: float,
                          threshold: float, frame_stride: int = 1,
                          max_frames: int = 0):
        """Decode + pipeline a video through the batcher, yielding
        per-frame dicts IN FRAME ORDER as results complete.

        Returns (fps, iterator). A sliding window of VIDEO_CHUNK pending
        futures keeps the device batcher fed while bounding decoded-frame
        memory and this upload's share of the queue (concurrent image
        requests keep interleaving). The transport-independent core under
        the aggregate `run_video` AND the gRPC EstimateVideoStream RPC —
        streaming is free because results were already consumed in order.
        """
        from collections import deque

        from human_body_proportion_estimation_tpu.utils.io import (
            stream_video_bytes,
        )

        frames, fps = stream_video_bytes(video_bytes, frame_stride)

        def gen():
            pending: deque = deque()  # (original frame index, Future)

            def drain_one() -> Dict[str, Any]:
                idx, fut = pending.popleft()
                r = fut.result()
                return {
                    "frame": idx,
                    "msg": r["msg"],
                    "body_proportion_lengths_(cm)":
                        r["body_proportion_lengths_(cm)"],
                }

            for n, frame in enumerate(frames):
                if max_frames and n >= max_frames:
                    frames.close()
                    break
                payload = {"image": frame, "height": height,
                           "threshold": threshold}
                try:
                    fut = self.batcher.submit(payload)
                except queue.Full:
                    # our own window may be what filled the queue — finish
                    # it and retry once before giving up (concurrent image
                    # requests then genuinely own the queue)
                    while pending:
                        yield drain_one()
                    fut = self.batcher.submit(payload)
                pending.append((n * frame_stride, fut))
                if len(pending) >= self.VIDEO_CHUNK:
                    yield drain_one()
            while pending:
                yield drain_one()

        return fps, gen()

    def run_video(self, video_bytes: bytes, height: float, threshold: float,
                  frame_stride: int = 1, max_frames: int = 0
                  ) -> Dict[str, Any]:
        """Transport-independent video aggregate shared by the HTTP form
        handler above and the gRPC EstimateVideo RPC."""
        fps, it = self.open_video_stream(
            video_bytes, height, threshold, frame_stride, max_frames
        )
        per_frame = list(it)
        return self.summarize_video(per_frame, fps, frame_stride)

    @staticmethod
    def summarize_video(per_frame: List[Dict[str, Any]], fps: float,
                        frame_stride: int) -> Dict[str, Any]:
        """Aggregate per-frame results into the video response shape
        (median across frames per segment)."""
        numeric: Dict[str, List[float]] = {}
        found_any = False
        for f in per_frame:
            if f["msg"] != "No humans detected":
                found_any = True
            for k, v in f["body_proportion_lengths_(cm)"].items():
                if isinstance(v, (int, float)):
                    numeric.setdefault(k, []).append(float(v))
        summary = {
            k: float(np.median(v)) for k, v in sorted(numeric.items())
        }
        return {
            "code": "success",
            "msg": ("human body proportion estimation complete"
                    if found_any else "No humans detected"),
            "fps": fps,
            "frame_stride": frame_stride,
            "num_frames_processed": len(per_frame),
            "frames": per_frame,
            "median_body_proportion_lengths_(cm)": summary,
        }

    @staticmethod
    def _post_webhook(url: str, payload: Dict[str, Any]):
        # fire-and-log, like ModelProcessTask (server.py:69-82)
        try:
            import requests

            requests.post(
                url,
                headers={"Content-Type": "application/json"},
                data=json.dumps(payload),
                timeout=(3, 100),
            )
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            log.error("webhook_failed", error=str(e))

    def shutdown(self):
        self.batcher.shutdown()
        if getattr(self, "_registry", None) is not None:
            self._registry.shutdown()


def _json_default(o):
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not serializable: {type(o)}")


def make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _send_json(self, obj, status=200):
            body = json.dumps(obj, default=_json_default).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_ndjson_stream(self, lines):
            """Chunked application/x-ndjson: one JSON object per line,
            written as each becomes available (HTTP twin of the gRPC
            EstimateVideoStream RPC)."""
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for obj in lines:
                data = json.dumps(obj, default=_json_default).encode() \
                    + b"\n"
                self.wfile.write(f"{len(data):x}\r\n".encode())
                self.wfile.write(data + b"\r\n")
                self.wfile.flush()
            self.wfile.write(b"0\r\n\r\n")

        def log_message(self, fmt, *args):  # quiet access log
            pass

        def do_GET(self):
            if self.path == "/":
                self._send_json(WELCOME)
            elif self.path == "/health":
                import jax

                payload = {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    # real|random per model slot — random-init slots serve
                    # garbage and must be visible (the reference always
                    # serves pretrained weights, README.md:13-26)
                    "weights": getattr(
                        app.pipeline, "weights_origin", {}
                    ),
                    # True once every batch bucket's program is compiled
                    # (--prewarm; Triton READY-after-load analog)
                    "prewarmed": getattr(
                        app.pipeline, "prewarmed", False
                    ),
                }
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    payload["hbm_bytes_in_use"] = stats.get("bytes_in_use")
                    payload["hbm_bytes_limit"] = stats.get("bytes_limit")
                except Exception:  # noqa: BLE001 — not all backends expose it
                    pass
                self._send_json(payload)
            elif self.path == "/metrics":
                self._send_json(app.metrics_snapshot())
            elif self.path in ("/v2/health/live", "/v2/health/ready"):
                # KServe-v2 liveness/readiness (Triton's /v2/health/*;
                # tritonclient.is_server_live/is_server_ready). Every
                # registered model is lazily servable, so a process that
                # answers is both live and ready.
                self._send_json({self.path.rsplit("/", 1)[1]: True})
            elif self.path == "/v2":
                # KServe-v2 server metadata (tritonclient
                # get_server_metadata): name/version + the protocol
                # extensions this server implements
                from human_body_proportion_estimation_tpu import (
                    __version__,
                )

                self._send_json({
                    "name": "human_body_proportion_estimation_tpu",
                    "version": __version__,
                    "extensions": [
                        "health", "model_repository",
                        "model_repository(unload_dependents)",
                        "model_configuration", "statistics",
                        "binary_tensor_data", "classification",
                        "parameters", "logging", "trace",
                    ],
                })
            elif self.path == "/v2/logging":
                # Triton logging extension (tritonclient
                # get_log_settings): the runtime-adjustable log switches
                from human_body_proportion_estimation_tpu.utils.logging import (  # noqa: E501
                    log_settings,
                )

                self._send_json(log_settings())
            elif self.path == "/v2/trace/setting":
                # Triton trace extension (tritonclient
                # get_trace_settings): string-valued settings document
                from human_body_proportion_estimation_tpu.serve.tracing import (  # noqa: E501
                    TRACER,
                )

                self._send_json(TRACER.settings())
            elif self.path == "/v2/models/stats":
                # all-models statistics (Triton's no-name
                # get_inference_statistics form)
                self._send_json(app.registry.statistics())
            elif self.path == "/v2/models":
                # repository index (read-only mirror of the gRPC
                # RepositoryIndex RPC; tensor inference is gRPC-only,
                # like the reference's Triton deployment)
                self._send_json({"models": app.registry.index()})
            elif self.path.startswith("/v2/models/"):
                # /v2/models/<name>[/versions/<v>][/config] — the KServe
                # v2 layout tritonclient drives (metadata AND config are
                # fetched separately, reference triton_utils.py:21-31)
                parts = self.path[len("/v2/models/"):].split("/")
                name, version = parts[0], ""
                rest = parts[1:]
                if len(rest) >= 2 and rest[0] == "versions":
                    version, rest = rest[1], rest[2:]
                try:
                    if rest == ["config"]:
                        self._send_json(
                            app.registry.config(name, version)
                        )
                    elif rest == ["ready"]:
                        # per-model readiness (tritonclient
                        # is_model_ready): metadata() raises for unknown
                        # name/version -> 404; every registered model is
                        # lazily servable -> ready
                        app.registry.metadata(name, version)
                        self._send_json({"name": name, "ready": True})
                    elif rest == ["stats"]:
                        # Triton get_inference_statistics for one model
                        self._send_json(
                            app.registry.statistics(name, version)
                        )
                    elif not rest:
                        self._send_json(
                            app.registry.metadata(name, version)
                        )
                    else:
                        self._send_json({"detail": "Not Found"}, 404)
                except KeyError as e:
                    self._send_json({"detail": str(e)}, 404)
            elif self.path == "/docs":
                # interactive Swagger-UI page rendering /openapi.json —
                # what a browser gets from the reference's FastAPI /docs
                # (uvicorn_server/server.py:122-124); assets come from
                # the standard swagger-ui CDN exactly like FastAPI's
                # bundled page
                body = _SWAGGER_UI_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/openapi.json":
                # real OpenAPI 3 document — contract parity with the
                # FastAPI auto-docs the reference's welcome JSON points
                # users at (uvicorn_server/server.py:122-124)
                from human_body_proportion_estimation_tpu.serve.openapi import (  # noqa: E501
                    build_schema,
                )

                self._send_json(
                    build_schema(app.DEFAULT_MAX_VIDEO_FRAMES)
                )
            else:
                self._send_json({"detail": "Not Found"}, 404)

        def _stream_video(self, form):
            """POST /body_proportion_length_estimation_video_stream:
            header line, per-frame lines in order, summary line last.
            Errors before the first byte fall back to the single failed
            JSON (never-500 parity); mid-stream errors terminate the
            stream with a code='failed' summary line (the gRPC stream's
            failed-summary behavior)."""
            fps, stride, frames = app.open_video_stream_form(form)

            def lines():
                yield {"code": "success", "fps": fps,
                       "frame_stride": stride}
                collected = []
                try:
                    for f in frames:
                        collected.append(f)
                        yield f
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    log.error("video_stream_failed", error=str(e))
                    yield {"code": "failed", "msg": FAIL_MSG}
                    return
                summary = app.summarize_video(collected, fps, stride)
                summary.pop("frames")  # already streamed line-by-line
                yield summary

            self._send_ndjson_stream(lines())

        def _v2_settings_update(self):
            """POST /v2/logging | /v2/trace/setting — the Triton logging
            and trace extensions' update forms (tritonclient
            update_log_settings / update_trace_settings): a JSON body
            with the fields to change; response is the full resulting
            settings document; unknown fields or bad values are the
            extensions' 400 {"error": ...} contract."""
            try:
                length = int(self.headers.get("Content-Length", "0"))
                updates = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(updates, dict):
                    raise ValueError("body must be a JSON object")
                if self.path == "/v2/logging":
                    from human_body_proportion_estimation_tpu.utils.logging import (  # noqa: E501
                        configure_logging,
                    )

                    self._send_json(configure_logging(updates))
                else:
                    from human_body_proportion_estimation_tpu.serve.tracing import (  # noqa: E501
                        TRACER,
                    )

                    self._send_json(TRACER.update(updates))
            except (ValueError, json.JSONDecodeError) as e:
                self._send_json({"error": str(e)}, 400)

        def _v2_repository(self):
            """POST /v2/repository/index and
            POST /v2/repository/models/<name>/load|unload — Triton's
            model-repository HTTP extension (the routes
            tritonclient.http get_model_repository_index / load_model /
            unload_model drive; the reference runs stock Triton whose
            server exposes them, README.md:47-80). Index accepts an
            optional JSON body {"ready": bool} and returns the
            repository rows; load/unload return an empty 200 on success
            and the extension's {"error": ...} 400 otherwise."""
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                if self.path == "/v2/repository/index":
                    doc = json.loads(body or b"{}")
                    if not isinstance(doc, dict):
                        raise ValueError("body must be a JSON object")
                    ready_only = bool(doc.get("ready", False))
                    rows = [
                        {"name": r["name"], "version": r["version"],
                         "state": r["state"], "reason": ""}
                        for r in app.registry.index()
                        if not ready_only or r["state"] == "READY"
                    ]
                    self._send_json(rows)
                    return
                prefix = "/v2/repository/models/"
                if not self.path.startswith(prefix):
                    self._send_json({"detail": "Not Found"}, 404)
                    return
                parts = self.path[len(prefix):].split("/")
                if len(parts) != 2 or parts[1] not in ("load", "unload"):
                    self._send_json({"detail": "Not Found"}, 404)
                    return
                name, action = parts
                # Triton's extension body: {"parameters":
                # {"unload_dependents": true}} on unload
                params = {}
                if body:
                    doc = json.loads(body)
                    if not isinstance(doc, dict):
                        raise ValueError("body must be a JSON object")
                    params = doc.get("parameters", {}) or {}
                    if not isinstance(params, dict):
                        raise ValueError("parameters must be an object")
                try:
                    if action == "load":
                        app.registry.load(name)
                    else:
                        app.registry.unload(
                            name,
                            unload_dependents=bool(
                                params.get("unload_dependents", False)
                            ),
                        )
                except KeyError as e:
                    # Triton's extension reports failures as 400 +
                    # {"error": ...}, including unknown model names
                    self._send_json({"error": str(e)}, 400)
                    return
                self._send_json({})
            except (ValueError, json.JSONDecodeError) as e:
                self._send_json({"error": str(e)}, 400)

        def _v2_infer(self):
            """POST /v2/models/<name>[/versions/<v>]/infer — the KServe-v2
            HTTP inference protocol, completing the HTTP mirror of the
            gRPC ModelInfer RPC: Triton serves the same route next to its
            gRPC endpoint. Two tensor transports, exactly Triton's:

            - JSON tensors: each input carries row-major values in `data`.
            - The binary_tensor_data extension (what tritonclient's HTTP
              path uses by default): `Inference-Header-Content-Length: J`
              marks the first J body bytes as the JSON header; the rest is
              raw little-endian tensor bytes, concatenated in `inputs`
              order for every input declaring
              `parameters.binary_data_size`. Outputs come back binary when
              the request sets per-output `parameters.binary_data` or the
              request-level `parameters.binary_data_output`; the response
              then carries the same header + trailing bytes in `outputs`
              order.

            KServe error contract: {"error": ...} with 400/404 (always
            pure JSON)."""
            import numpy as np

            from human_body_proportion_estimation_tpu.serve.registry import (
                NP_TO_TRITON,
                TRITON_TO_NP,
            )

            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            parts = self.path[len("/v2/models/"):].split("/")
            name, rest = parts[0], parts[1:]
            version = ""
            if len(rest) >= 2 and rest[0] == "versions":
                version, rest = rest[1], rest[2:]
            if rest != ["infer"]:
                self._send_json({"detail": "Not Found"}, 404)
                return
            try:
                json_len = self.headers.get(
                    "Inference-Header-Content-Length"
                )
                blob = b""
                if json_len is not None:
                    json_len = int(json_len)
                    if not 0 <= json_len <= len(body):
                        raise ValueError(
                            "Inference-Header-Content-Length "
                            f"{json_len} outside body ({len(body)} bytes)"
                        )
                    body, blob = body[:json_len], body[json_len:]
                doc = json.loads(body)
                inputs = {}
                cursor = 0
                for t in doc.get("inputs", []):
                    dt = t["datatype"]
                    if dt not in TRITON_TO_NP:
                        raise ValueError(f"unsupported datatype '{dt}'")
                    dtype = np.dtype(TRITON_TO_NP[dt]).newbyteorder("<")
                    nbin = (t.get("parameters") or {}).get(
                        "binary_data_size"
                    )
                    if nbin is not None:
                        # binary transport: consume this input's slice of
                        # the trailing bytes (strict sizing, like Triton)
                        want = int(np.prod(t["shape"], dtype=np.int64)
                                   ) * dtype.itemsize
                        if int(nbin) != want:
                            raise ValueError(
                                f"input '{t['name']}': binary_data_size "
                                f"{nbin} != shape {t['shape']} x "
                                f"{dt} = {want} bytes"
                            )
                        if cursor + want > len(blob):
                            raise ValueError(
                                f"input '{t['name']}': binary payload "
                                "truncated (need "
                                f"{cursor + want - len(blob)} more bytes; "
                                "is Inference-Header-Content-Length set?)"
                            )
                        inputs[t["name"]] = np.frombuffer(
                            blob, dtype=dtype, count=want // dtype.itemsize,
                            offset=cursor,
                        ).reshape(t["shape"])
                        cursor += want
                    else:
                        inputs[t["name"]] = np.asarray(
                            t["data"], dtype=dtype
                        ).reshape(t["shape"])
                if cursor != len(blob):
                    raise ValueError(
                        f"{len(blob) - cursor} trailing binary bytes not "
                        "claimed by any input's binary_data_size"
                    )
                out_specs = doc.get("outputs", [])
                out_names = [o["name"] for o in out_specs] or None
                # per-output binary_data, defaulted by the request-level
                # binary_data_output parameter (both are Triton's)
                bin_default = bool((doc.get("parameters") or {}).get(
                    "binary_data_output", False
                ))
                bin_out = {
                    o["name"]: bool((o.get("parameters") or {}).get(
                        "binary_data", bin_default
                    ))
                    for o in out_specs
                }
                # Triton's classification extension: per-output
                # parameters.classification = k replaces the tensor with
                # top-k "value:index" BYTES strings
                class_counts = {
                    o["name"]: int(
                        (o.get("parameters") or {}).get("classification", 0)
                    )
                    for o in out_specs
                    if (o.get("parameters") or {}).get("classification")
                }
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                self._send_json({"error": f"malformed request: {e}"}, 400)
                return
            try:
                out = app.registry.infer(
                    name, inputs, out_names, version=version
                )
            except KeyError as e:
                self._send_json({"error": str(e)}, 404)
                return
            except ValueError as e:
                self._send_json({"error": str(e)}, 400)
                return
            tensors, chunks = [], []
            for k, v in out.items():
                if k in class_counts and class_counts[k] > 0:
                    from human_body_proportion_estimation_tpu.serve.kserve_grpc import (  # noqa: E501
                        _classification_rows,
                        serialize_bytes_tensor,
                    )

                    rows = _classification_rows(v, class_counts[k])
                    if bin_out.get(k, bin_default):
                        raw = serialize_bytes_tensor(
                            [b for b in rows.ravel()]
                        )
                        chunks.append(raw)
                        tensors.append(
                            {"name": k, "shape": list(rows.shape),
                             "datatype": "BYTES",
                             "parameters": {"binary_data_size": len(raw)}}
                        )
                    else:
                        tensors.append(
                            {"name": k, "shape": list(rows.shape),
                             "datatype": "BYTES",
                             "data": [b.decode() for b in rows.ravel()]}
                        )
                elif bin_out.get(k, bin_default):
                    raw = np.ascontiguousarray(v).astype(
                        v.dtype.newbyteorder("<"), copy=False
                    ).tobytes()
                    chunks.append(raw)
                    tensors.append(
                        {"name": k, "shape": list(v.shape),
                         "datatype": NP_TO_TRITON[v.dtype],
                         "parameters": {"binary_data_size": len(raw)}}
                    )
                else:
                    tensors.append(
                        {"name": k, "shape": list(v.shape),
                         "datatype": NP_TO_TRITON[v.dtype],
                         "data": v.ravel().tolist()}
                    )
            reply = {"model_name": name, "model_version": "1",
                     "outputs": tensors}
            if not chunks:
                self._send_json(reply)
                return
            header = json.dumps(reply).encode()
            payload = header + b"".join(chunks)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Inference-Header-Content-Length",
                             str(len(header)))
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            routes = {
                "/body_proportion_length_estimation_file":
                    app.handle_estimation,
                "/body_proportion_length_estimation_video":
                    app.handle_video_estimation,
            }
            stream = self.path == \
                "/body_proportion_length_estimation_video_stream"
            handler = routes.get(self.path)
            if handler is None and not stream:
                if (self.path.startswith("/v2/models/")
                        and self.path.endswith("/infer")):
                    self._v2_infer()
                    return
                if self.path in ("/v2/logging", "/v2/trace/setting"):
                    self._v2_settings_update()
                    return
                if self.path.startswith("/v2/repository/"):
                    self._v2_repository()
                    return
                self._send_json({"detail": "Not Found"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                form = parse_multipart(
                    body, self.headers.get("Content-Type", "")
                )
                if stream:
                    self._stream_video(form)
                else:
                    self._send_json(handler(form))
            except queue.Full:
                log.warning("backpressure_reject")
                self._send_json(
                    {"code": "failed", "msg": "server overloaded"}, 503
                )
            except Exception as e:  # noqa: BLE001 — parity: never 500
                traceback.print_exc()
                log.error("request_failed", error=str(e))
                self._send_json({"msg": FAIL_MSG, "code": "failed"})

    return Handler


class _Server(ThreadingHTTPServer):
    daemon_threads = True
    # the stdlib default listen backlog (5) resets connections under
    # concurrent load; perf sweeps open dozens of sockets at once
    request_queue_size = 128


def create_server(app: ServingApp, host: str, port: int) -> ThreadingHTTPServer:
    return _Server((host, port), make_handler(app))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU body proportion estimation service"
    )
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--grpc-port", type=int, default=8081,
                        help="gRPC endpoint port (0 disables); the "
                             "reference exposes Triton gRPC on 8081")
    parser.add_argument(
        "--detector", default="ssd_mobilenet",
        choices=["efficientdet_lite4", "efficientdet_lite0",
                 "ssd_mobilenet", "yolov5s", "yolov5m"],
        help="default ssd_mobilenet — the slot with REAL weights from the "
             "reference's checked-in ssd.tflite; efficientdet/yolov5 need "
             "--checkpoint-dir to serve non-random weights",
    )
    parser.add_argument("--checkpoint-dir", default=None,
                        help="orbax checkpoint dir with det/pose params")
    parser.add_argument(
        "--artifact-dir", default=None,
        help="serve from an exported artifact directory (StableHLO fused "
             "program + orbax weights + meta.json, see pipeline/export.py "
             "and the export-artifact CLI) instead of building models — "
             "the Triton model-repository load path (reference README "
             ":47-80). Overrides --detector/--checkpoint-dir; combines "
             "with --data-parallel (restored program shard_map'd over N "
             "chips, effective batch = artifact batch x N)",
    )
    parser.add_argument("--data-parallel", type=int, default=0,
                        help="shard serving batches over N chips "
                             "(0 = single device)")
    parser.add_argument(
        "--prewarm", action="store_true",
        help="compile + run the serving program for every batch bucket "
             "before accepting traffic (Triton READY-after-load analog, "
             "reference README :56-64) — first requests never stall on "
             "XLA compilation; /health reports prewarmed: true",
    )
    parser.add_argument(
        "--compile-cache-dir", default="",
        help="persistent XLA compilation cache directory (TensorRT "
             "engine-cache analog): server restarts skip recompiling the "
             "fused programs. Default ~/.cache/hbpe_xla_cache; pass "
             "--no-compile-cache to disable",
    )
    parser.add_argument("--no-compile-cache", action="store_true",
                        help="disable the persistent compilation cache")
    parser.add_argument(
        "--bottom-up", action="store_true",
        help="serve the detector-free bottom-up pipeline instead "
             "(HigherHRNet + associative-embedding grouping, one model "
             "pass per image; beyond-reference capability). --detector is "
             "ignored; the request 'threshold' form maps to the AE peak "
             "score threshold fixed at startup, not per request",
    )
    args = parser.parse_args(argv)

    if not args.no_compile_cache:
        from human_body_proportion_estimation_tpu.utils import compile_cache

        d = compile_cache.enable(args.compile_cache_dir or None)
        print(f"compilation cache: {d}", flush=True)

    if args.artifact_dir:
        from human_body_proportion_estimation_tpu.pipeline.export import (
            ArtifactPipeline,
        )

        mesh = None
        if args.data_parallel > 1:
            from human_body_proportion_estimation_tpu.parallel.mesh import (
                make_mesh,
            )

            mesh = make_mesh(args.data_parallel)
        pipeline = ArtifactPipeline(args.artifact_dir, mesh=mesh)
        if "real" not in pipeline.weights_origin.values():
            print(
                "WARNING: artifact carries no real-weight slot "
                f"({pipeline.weights_origin}) — outputs are garbage "
                "(see /health 'weights')",
                flush=True,
            )
        _serve(args, pipeline, detector_name="artifact")
        return

    if args.bottom_up:
        from human_body_proportion_estimation_tpu.pipeline.bottomup import (
            BottomUpPipeline,
        )

        from human_body_proportion_estimation_tpu.models import weights

        pose_vars = None
        bu_synthetic = False
        if args.checkpoint_dir:
            # checkpoint layout shared with the top-down pipeline; the
            # detector slot is absent/ignored in bottom-up mode
            _, pose_vars = weights.load_pipeline_checkpoint(
                args.checkpoint_dir
            )
        else:
            # no checkpoint given: fall back to the committed synthetic-
            # certified HigherHRNet weights (cli/certify_bottomup.py;
            # accuracy table in BENCHMARKS.md), same no-random-serving
            # policy as the top-down default below
            _, pose_vars = weights.maybe_load_certified(bottom_up=True)
            if pose_vars is not None:
                bu_synthetic = True
                print(
                    "serving committed synthetic-certified bottom-up "
                    "weights "
                    f"({weights.default_certified_bottomup_checkpoint()})",
                    flush=True,
                )
        mesh = None
        if args.data_parallel > 1:
            from human_body_proportion_estimation_tpu.parallel.mesh import (
                make_mesh,
            )

            mesh = make_mesh(args.data_parallel)
        pipeline = BottomUpPipeline(pose_vars=pose_vars, mesh=mesh)
        if bu_synthetic:
            pipeline.weights_origin["pose"] = "synthetic-certified"
        if pipeline.weights_origin["pose"] == "random":
            print(
                "WARNING: serving RANDOM-INIT HigherHRNet — outputs are "
                "garbage; pass --checkpoint-dir (see /health 'weights')",
                flush=True,
            )
        _serve(args, pipeline, detector_name="bottom_up")
        return

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE0,
        EFFICIENTDET_LITE4,
    )

    det_cfg = (
        EFFICIENTDET_LITE0 if args.detector == "efficientdet_lite0"
        else EFFICIENTDET_LITE4
    )
    det_vars = pose_vars = None
    synthetic_slots = []
    if args.checkpoint_dir:
        from human_body_proportion_estimation_tpu.models import weights

        det_vars, pose_vars = weights.load_pipeline_checkpoint(
            args.checkpoint_dir
        )
        if args.detector == "ssd_mobilenet":
            # SSD loads its own real weights (reference ssd.tflite); the
            # checkpoint's detector slot is EfficientDet/YOLO-shaped and
            # would crash SSDBackend — use only the pose side
            det_vars = None
    else:
        # no checkpoint given: fall back to the committed synthetic-
        # certified flagship weights (cli/certify.py --det-arch lite4;
        # accuracy table in BENCHMARKS.md) for any slot that would
        # otherwise serve random init. The reference NEVER serves
        # untrained weights (README.md:13-26 download is mandatory);
        # neither does the default server here.
        import os as _os

        from human_body_proportion_estimation_tpu.models import weights

        _ckpt = weights.default_certified_checkpoint()
        if _os.path.exists(_ckpt):
            _det_c, pose_vars = weights.load_compact_checkpoint(_ckpt)
            synthetic_slots.append("pose")
            if args.detector == "efficientdet_lite4":
                det_vars = _det_c
                synthetic_slots.append("detector")
            print(
                "serving committed synthetic-certified weights for "
                f"{'+'.join(synthetic_slots)} ({_ckpt})", flush=True,
            )
    mesh = None
    if args.data_parallel > 1:
        from human_body_proportion_estimation_tpu.parallel.mesh import (
            make_mesh,
        )

        mesh = make_mesh(args.data_parallel)
    pipeline = InferencePipeline(
        det_config=det_cfg, det_vars=det_vars, pose_vars=pose_vars,
        detector=args.detector,
        mesh=mesh,
    )
    for slot in synthetic_slots:
        # honest /health label: trained on synthetic scenes + certified
        # (cm gates), not the upstream pretrained weights
        pipeline.weights_origin[slot] = "synthetic-certified"
    if "random" in pipeline.weights_origin.values():
        print(
            "WARNING: serving RANDOM-INIT weights for "
            + ", ".join(k for k, v in pipeline.weights_origin.items()
                        if v == "random")
            + " — outputs are garbage; pass --checkpoint-dir or use "
              "--detector ssd_mobilenet (see /health 'weights')",
            flush=True,
        )
    _serve(args, pipeline, detector_name=args.detector)


def _serve(args, pipeline, detector_name: str):
    if getattr(args, "prewarm", False):
        import time as _time

        from human_body_proportion_estimation_tpu.pipeline.host import (
            prewarm_serving,
        )

        t0 = _time.time()
        warmed = prewarm_serving(pipeline)
        log.info("prewarmed", buckets=warmed,
                 seconds=round(_time.time() - t0, 1))
        print(f"prewarmed batch buckets {warmed} "
              f"in {_time.time() - t0:.1f}s", flush=True)
    app = ServingApp(pipeline)
    server = create_server(app, args.host, args.port)
    grpc_server = None
    if args.grpc_port:
        from human_body_proportion_estimation_tpu.serve.grpc_server import (
            create_grpc_server,
        )

        grpc_server, bound = create_grpc_server(app, args.host,
                                                args.grpc_port)
        grpc_server.start()
        log.info("grpc_listening", host=args.host, port=bound)
        print(f"grpc on {args.host}:{bound}", flush=True)
    log.info("http_listening", host=args.host, port=args.port,
             engine="native" if app.native else "python",
             detector=detector_name)
    print(f"serving on {args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if grpc_server is not None:
            grpc_server.stop(0)
        app.shutdown()


if __name__ == "__main__":
    main()
