"""The stock KServe-v2 / Triton gRPC wire protocol
(`inference.GRPCInferenceService`).

The reference's only client dependency is `tritonclient[grpc]==2.45.0`
(reference requirements.txt:9); its drivers call get_model_metadata /
get_model_config / infer over this protocol
(modules/triton_utils.py:11-34,167-171). These tests drive every RPC
through stubs generated from the vendored wire-exact schema
(`serve/kserve.proto`) against a running server — byte-identical wire
traffic to what a stock tritonclient emits.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kserve_app():
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
    yield app, port
    server.stop(0)
    app.shutdown()


@pytest.fixture(scope="module")
def kclient(kserve_app):
    from human_body_proportion_estimation_tpu.serve.kserve_grpc import (
        KServeClient,
    )

    _, port = kserve_app
    client = KServeClient(f"127.0.0.1:{port}")
    yield client
    client.close()


def test_wire_schema_is_tritons(tmp_path):
    """The vendored schema must BE the public Triton/KServe wire schema:
    service + method full names and the field numbers tritonclient 2.45
    serializes (spot-checked against Triton's grpc_service.proto) —
    that's what makes stock-client traffic decode correctly here."""
    from google.protobuf import descriptor_pb2

    from human_body_proportion_estimation_tpu.serve import kserve_pb2 as kpb

    svc = kpb.DESCRIPTOR.services_by_name["GRPCInferenceService"]
    assert svc.full_name == "inference.GRPCInferenceService"
    methods = {m.name for m in svc.methods}
    assert {
        "ServerLive", "ServerReady", "ModelReady", "ServerMetadata",
        "ModelMetadata", "ModelInfer", "ModelStreamInfer", "ModelConfig",
        "ModelStatistics", "RepositoryIndex", "RepositoryModelLoad",
        "RepositoryModelUnload", "TraceSetting", "LogSettings",
        "SystemSharedMemoryStatus", "CudaSharedMemoryRegister",
    } <= methods

    def field_num(msg, name):
        return msg.DESCRIPTOR.fields_by_name[name].number

    # ModelInferRequest — Triton grpc_service.proto field numbers
    req = kpb.ModelInferRequest
    assert [field_num(req, n) for n in (
        "model_name", "model_version", "id", "parameters", "inputs",
        "outputs", "raw_input_contents")] == [1, 2, 3, 4, 5, 6, 7]
    it = kpb.ModelInferRequest.InferInputTensor
    assert [field_num(it, n) for n in (
        "name", "datatype", "shape", "parameters", "contents")] == \
        [1, 2, 3, 4, 5]
    resp = kpb.ModelInferResponse
    assert [field_num(resp, n) for n in (
        "model_name", "model_version", "id", "parameters", "outputs",
        "raw_output_contents")] == [1, 2, 3, 4, 5, 6]
    # InferTensorContents typed fields
    c = kpb.InferTensorContents
    assert [field_num(c, n) for n in (
        "bool_contents", "int_contents", "int64_contents",
        "uint_contents", "uint64_contents", "fp32_contents",
        "fp64_contents", "bytes_contents")] == [1, 2, 3, 4, 5, 6, 7, 8]
    # ModelConfig — model_config.proto numbers the reference reads
    mc = kpb.ModelConfig
    assert field_num(mc, "name") == 1
    assert field_num(mc, "platform") == 2
    assert field_num(mc, "max_batch_size") == 4
    assert field_num(mc, "input") == 5
    assert field_num(mc, "output") == 6
    assert field_num(mc, "instance_group") == 7
    assert field_num(mc, "dynamic_batching") == 11
    assert field_num(mc, "backend") == 17
    mi = kpb.ModelInput
    assert [field_num(mi, n) for n in (
        "name", "data_type", "format", "dims")] == [1, 2, 3, 4]
    assert kpb.ModelInput.Format.Value("FORMAT_NHWC") == 1
    assert kpb.DataType.Value("TYPE_FP32") == 11
    assert kpb.DataType.Value("TYPE_UINT8") == 2
    mo = kpb.ModelOutput
    assert [field_num(mo, n) for n in ("name", "data_type", "dims")] == \
        [1, 2, 3]
    assert kpb.ModelInstanceGroup.Kind.Value("KIND_MODEL") == 3
    assert field_num(kpb.ModelInstanceGroup, "count") == 2
    assert field_num(kpb.ModelInstanceGroup, "kind") == 4
    # statistics
    ms = kpb.ModelStatistics
    assert [field_num(ms, n) for n in (
        "name", "version", "last_inference", "inference_count",
        "execution_count", "inference_stats", "batch_stats")] == \
        [1, 2, 3, 4, 5, 6, 7]
    # stream wrapper
    sw = kpb.ModelStreamInferResponse
    assert field_num(sw, "error_message") == 1
    assert field_num(sw, "infer_response") == 2

    # descriptor-level check that numbers survive serialization
    fdp = descriptor_pb2.FileDescriptorProto()
    kpb.DESCRIPTOR.CopyToProto(fdp)
    assert fdp.package == "inference"


def test_server_live_ready_metadata(kclient):
    assert kclient.is_server_live() is True
    assert kclient.is_server_ready() is True
    meta = kclient.get_server_metadata()
    assert meta.name == "human_body_proportion_estimation_tpu"
    assert "model_repository" in list(meta.extensions)
    assert "statistics" in list(meta.extensions)


def test_model_ready_metadata_config(kclient):
    import grpc

    assert kclient.is_model_ready("hrnet") is True
    with pytest.raises(grpc.RpcError) as err:
        kclient.is_model_ready("nope")
    assert err.value.code() == grpc.StatusCode.NOT_FOUND

    meta = kclient.get_model_metadata("hrnet", model_version="1")
    assert meta.name == "hrnet"
    assert list(meta.versions) == ["1"]
    assert meta.inputs[0].name == "input"
    assert meta.inputs[0].datatype == "FP32"
    # shape includes batch dim (metadata convention)
    assert len(meta.inputs[0].shape) == 4

    cfgr = kclient.get_model_config("hrnet")
    cfg = cfgr.config  # reference obj_det_edet4_trtserver.py:76
    assert cfg.name == "hrnet"
    assert cfg.max_batch_size > 0
    from human_body_proportion_estimation_tpu.serve import kserve_pb2 as kpb
    assert cfg.input[0].data_type == kpb.DataType.Value("TYPE_FP32")
    assert cfg.input[0].format == kpb.ModelInput.Format.Value(
        "FORMAT_NONE")
    # config dims EXCLUDE batch when max_batch_size > 0 (Triton docs)
    assert len(cfg.input[0].dims) == 3
    assert cfg.instance_group[0].kind == \
        kpb.ModelInstanceGroup.Kind.Value("KIND_MODEL")
    assert cfg.dynamic_batching.preferred_batch_size


def test_model_infer_raw_contents(kserve_app, kclient):
    """The tritonclient.infer wire path: raw_input_contents in,
    raw_output_contents out (triton_utils.py:167-177)."""
    app, _ = kserve_app
    meta = app.registry.metadata("hrnet")
    h, w = meta["inputs"][0]["shape"][2], meta["inputs"][0]["shape"][3]
    x = np.random.default_rng(0).standard_normal(
        (2, 3, h, w)).astype(np.float32)
    out = kclient.infer("hrnet", {"input": x}, output_names=["output"],
                        request_id="42", model_version="1")
    assert set(out) == {"output"}
    assert out["output"].shape[0] == 2
    assert out["output"].dtype == np.float32
    assert np.isfinite(out["output"]).all()

    # direct local run must match the served result bit-for-bit
    want = app.registry.infer("hrnet", {"input": x})["output"]
    np.testing.assert_array_equal(out["output"], want)


def test_model_infer_typed_contents(kserve_app, kclient):
    """InferTensorContents (typed) requests — the non-raw protocol
    variant some KServe clients send."""
    from human_body_proportion_estimation_tpu.serve import kserve_pb2 as kpb

    app, port = kserve_app
    meta = app.registry.metadata("hrnet")
    h, w = meta["inputs"][0]["shape"][2], meta["inputs"][0]["shape"][3]
    x = np.random.default_rng(1).standard_normal(
        (1, 3, h, w)).astype(np.float32)
    req = kpb.ModelInferRequest(model_name="hrnet")
    t = req.inputs.add(name="input", datatype="FP32", shape=[1, 3, h, w])
    t.contents.fp32_contents.extend(x.ravel().tolist())
    resp = kclient._model_infer(req, timeout=600.0)
    got = kclient._parse_response(resp)["output"]
    want = app.registry.infer("hrnet", {"input": x})["output"]
    np.testing.assert_array_equal(got, want)


def test_model_infer_errors(kclient):
    import grpc

    with pytest.raises(grpc.RpcError) as err:
        kclient.infer("nope", {"input": np.zeros((1,), np.float32)})
    assert err.value.code() == grpc.StatusCode.NOT_FOUND
    with pytest.raises(grpc.RpcError) as err:
        kclient.infer("hrnet", {"wrong_name": np.zeros((1,), np.float32)})
    assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_classification_parameter(kserve_app, kclient):
    """Triton's `classification` requested-output parameter (tritonclient
    InferRequestedOutput(class_count=k), triton_utils.py:48-49): output
    replaced by top-k "value:index" BYTES strings."""
    app, _ = kserve_app
    meta = app.registry.metadata("hrnet")
    h, w = meta["inputs"][0]["shape"][2], meta["inputs"][0]["shape"][3]
    x = np.random.default_rng(7).standard_normal(
        (1, 3, h, w)).astype(np.float32)
    out = kclient.infer("hrnet", {"input": x}, output_names=["output"],
                        class_counts={"output": 3})
    rows = out["output"]
    assert rows.shape == (1, 3)
    top = [r.decode() for r in rows[0]]
    # "value:index" with descending values
    vals = [float(s.split(":")[0]) for s in top]
    assert vals == sorted(vals, reverse=True)
    want = app.registry.infer("hrnet", {"input": x})["output"]
    flat = want[0].ravel()
    assert int(top[0].split(":")[1]) == int(np.argmax(flat))


def test_classification_rows_bool_and_unsigned():
    """The ranking view must not negate bool_ (TypeError) or wrap
    unsigned dtypes (wrong order) — the wire layer's dtype table is a
    superset of what registry models emit today (review r5)."""
    from human_body_proportion_estimation_tpu.serve.kserve_grpc import (
        _classification_rows,
    )

    b = _classification_rows(np.asarray([[False, True, False]]), 2)
    assert [int(s.split(b":")[1]) for s in b[0]] == [1, 0]
    u = _classification_rows(
        np.asarray([[1, 255, 7]], dtype=np.uint8), 3
    )
    assert [int(s.split(b":")[1]) for s in u[0]] == [1, 2, 0]


def test_stream_infer(kserve_app, kclient):
    app, _ = kserve_app
    meta = app.registry.metadata("hrnet")
    h, w = meta["inputs"][0]["shape"][2], meta["inputs"][0]["shape"][3]
    rng = np.random.default_rng(2)
    reqs = [
        {"model_name": "hrnet",
         "inputs": {"input": rng.standard_normal(
             (1, 3, h, w)).astype(np.float32)},
         "id": f"r{i}"}
        for i in range(3)
    ]
    # one bad request rides in-band, the stream keeps going
    reqs.insert(2, {"model_name": "nope",
                    "inputs": {"x": np.zeros((1,), np.float32)},
                    "id": "bad"})
    results = list(kclient.stream_infer(reqs))
    assert len(results) == 4
    assert [r["error"] is None for r in results] == \
        [True, True, False, True]
    assert results[0]["outputs"]["output"].shape[0] == 1
    # in-band errors echo the request id so pipelined clients can
    # correlate the failure (review r5)
    assert [r["id"] for r in results] == ["r0", "r1", "bad", "r2"]


def test_statistics_and_repository(kserve_app, kclient):
    import grpc

    app, _ = kserve_app
    stats = kclient.get_inference_statistics("hrnet")
    assert stats.model_stats[0].name == "hrnet"
    assert stats.model_stats[0].inference_count >= 1  # prior tests ran it
    assert stats.model_stats[0].inference_stats.success.count >= 1

    index = kclient.get_model_repository_index()
    names = {m.name for m in index}
    assert "hrnet" in names and "ensemble_edet4_person_det_pose" in names
    assert all(m.state == "READY" for m in index)

    kclient.unload_model("hrnet")
    assert not app.registry._get("hrnet").loaded
    kclient.load_model("hrnet")
    assert app.registry._get("hrnet").loaded
    with pytest.raises(grpc.RpcError) as err:
        kclient.load_model("nope")
    assert err.value.code() == grpc.StatusCode.NOT_FOUND

    # unload_dependents (the advertised model_repository extension
    # parameter): unloading the ensemble also unloads its composing
    # models; without the flag they stay loaded
    kclient.load_model("hrnet")
    kclient.unload_model("ensemble_edet4_person_det_pose")
    assert app.registry._get("hrnet").loaded
    kclient.unload_model("ensemble_edet4_person_det_pose",
                         unload_dependents=True)
    assert not app.registry._get("hrnet").loaded
    kclient.load_model("hrnet")


def test_shared_memory_surface(kclient):
    import grpc

    from human_body_proportion_estimation_tpu.serve import kserve_pb2 as kpb

    status = kclient._channel.unary_unary(
        "/inference.GRPCInferenceService/SystemSharedMemoryStatus",
        request_serializer=(
            kpb.SystemSharedMemoryStatusRequest.SerializeToString
        ),
        response_deserializer=(
            kpb.SystemSharedMemoryStatusResponse.FromString
        ),
    )(kpb.SystemSharedMemoryStatusRequest(), timeout=10)
    assert len(status.regions) == 0

    register = kclient._channel.unary_unary(
        "/inference.GRPCInferenceService/SystemSharedMemoryRegister",
        request_serializer=(
            kpb.SystemSharedMemoryRegisterRequest.SerializeToString
        ),
        response_deserializer=(
            kpb.SystemSharedMemoryRegisterResponse.FromString
        ),
    )
    with pytest.raises(grpc.RpcError) as err:
        register(kpb.SystemSharedMemoryRegisterRequest(name="r"),
                 timeout=10)
    assert err.value.code() == grpc.StatusCode.UNIMPLEMENTED


def test_trace_and_log_settings(kclient, monkeypatch, tmp_path):
    import grpc

    from human_body_proportion_estimation_tpu.serve import tracing
    from human_body_proportion_estimation_tpu.utils.logging import (
        configure_logging,
        log_settings,
    )

    tracer = tracing.RequestTracer()
    tracer.trace_file = str(tmp_path / "trace.json")
    monkeypatch.setattr(tracing, "TRACER", tracer)
    log_before = log_settings()
    try:
        doc = kclient.get_trace_settings()
        assert doc["trace_level"] == ["OFF"]
        out = kclient.update_trace_settings(
            {"trace_level": ["TIMESTAMPS"], "trace_rate": 9}
        )
        assert out["trace_rate"] == ["9"]
        assert tracer.trace_rate == 9
        with pytest.raises(grpc.RpcError) as err:
            kclient.update_trace_settings({"trace_rate": 0})
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT

        doc = kclient.get_log_settings()
        assert doc["log_info"] is True
        out = kclient.update_log_settings({"log_verbose_level": 2})
        assert out["log_verbose_level"] == 2
        assert log_settings()["log_verbose_level"] == 2
        with pytest.raises(grpc.RpcError) as err:
            kclient.update_log_settings({"log_format": "rfc3339"})
        assert err.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        configure_logging(log_before)


def test_bytes_tensor_framing():
    from human_body_proportion_estimation_tpu.serve.kserve_grpc import (
        deserialize_bytes_tensor,
        serialize_bytes_tensor,
    )

    rows = [b"", b"a", b"hello world", bytes(range(256))]
    assert deserialize_bytes_tensor(serialize_bytes_tensor(rows)) == rows
    with pytest.raises(ValueError):
        deserialize_bytes_tensor(b"\x05\x00\x00\x00ab")  # truncated
