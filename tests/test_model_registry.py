"""Named-model registry (Triton model-repository role, serve/registry.py):
metadata introspection, tensor-level inference, reference tensor contracts
(model names / input-output names / dynamic-slice semantics of
`models/conv.py:82-86` and the drivers), and validation errors."""

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


from human_body_proportion_estimation_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PoseConfig,
    ServeConfig,
)

REFERENCE_MODELS = {
    "ensemble_edet4_person_det_pose",
    "edetlite4",
    "edetlite4_modified",
    "hrnet",
    "higherhrnet",
    "yolov5m",
    "yolov5s",
    "ssd_mobilenet",  # beyond-reference slot: always REAL weights
}


def tiny_config():
    return PipelineConfig(
        detector=DetectorConfig(input_height=128, input_width=128),
        pose=PoseConfig(crop_height=64, crop_width=64,
                        heatmap_height=16, heatmap_width=16),
        serve=ServeConfig(max_batch=4, batch_timeout_ms=3),
    )


@pytest.fixture(scope="module")
def pipeline_and_registry():
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.serve.registry import (
        build_registry,
    )

    # rng_seed != 0: the registry's standalone fallback inits with
    # PRNGKey(0), so param SHARING with the pipeline is only observable
    # when the pipeline's params differ from that fallback
    from tests.tiny_models import tiny_edet_config, tiny_hrnet

    # depth-reduced shared models (registry metadata derives from config
    # shapes, not model depth; standalone slots build their own models)
    pipe = InferencePipeline(config=tiny_config(),
                             det_config=tiny_edet_config(),
                             pose=tiny_hrnet(), rng_seed=7)
    return pipe, build_registry(pipe)


def test_repository_roster_and_index(pipeline_and_registry):
    _, reg = pipeline_and_registry
    assert set(reg.names()) == REFERENCE_MODELS
    idx = {row["name"]: row for row in reg.index()}
    # nothing loaded before first inference (lazy, like Triton's
    # load-on-demand repository mode) and everything servable
    assert all(row["state"] == "READY" for row in idx.values())
    assert not idx["yolov5m"]["loaded"]
    assert idx["hrnet"]["weights"] in ("real", "random")


def test_metadata_is_parse_model_grpc_shaped(pipeline_and_registry):
    """The fields the reference's parse_model_grpc consumes
    (triton_utils.py:54-72): input/output names, dtypes, shapes,
    max_batch_size."""
    _, reg = pipeline_and_registry
    meta = reg.metadata("hrnet")
    assert meta["max_batch_size"] == 4
    (inp,) = meta["inputs"]
    assert inp == {"name": "input", "datatype": "FP32",
                   "shape": [-1, 3, 64, 64]}
    (out,) = meta["outputs"]
    assert out["name"] == "output"          # pose_est_hrnet_trtserver.py:25
    assert out["shape"] == [-1, 17, 16, 16]

    meta = reg.metadata("ensemble_edet4_person_det_pose")
    assert [t["name"] for t in meta["inputs"]] == [
        "edet_input_image", "det_thres", "det_xy_change",
    ]  # models/conv.py:11-14 signature
    assert [t["name"] for t in meta["outputs"]] == [
        "ENSEMBLE_OUTPUT_FILTER_DET_BOXES", "ENSEMBLE_OUTPUT_HEATMAPS",
    ]  # person_det_pose_edet4_trtserver.py:22-23

    meta = reg.metadata("yolov5m")
    assert meta["inputs"][0]["name"] == "images"
    assert meta["outputs"][0]["shape"] == [-1, 25200, 85]

    meta = reg.metadata("edetlite4_modified")
    assert [t["name"] for t in meta["outputs"]] == [
        "detection_boxes", "detection_scores", "detection_classes",
        "filtered_boxes", "human_crops",
    ]  # models/conv.py:82-86


def test_hrnet_runner_matches_direct_apply(pipeline_and_registry):
    """Registry `hrnet` == the pipeline's own pose model with the
    PIPELINE's params (they must be shared — the fixture seeds them away
    from the registry's standalone fallback): NCHW wire in, NCHW heatmaps
    out. Comparison uses an identically structured jitted program —
    bf16 compute makes jit-vs-eager differ by fusion/accumulation order."""
    import jax
    import jax.numpy as jnp

    pipe, reg = pipeline_and_registry
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 64, 64), np.float32)
    out = reg.infer("hrnet", {"input": x})
    assert set(out) == {"output"}
    assert out["output"].shape == (2, 17, 16, 16)

    def direct_program(v, t):
        return jnp.moveaxis(
            pipe.pose.apply(v, jnp.transpose(t, (0, 2, 3, 1))), -1, 1
        )

    direct = np.asarray(
        jax.jit(direct_program)(pipe.pose_vars, jnp.asarray(x))
    )
    np.testing.assert_allclose(out["output"], direct, rtol=0, atol=0)
    assert {r["name"]: r["loaded"] for r in reg.index()}["hrnet"]


def test_edetlite4_raw_contract(pipeline_and_registry):
    """`edetlite4`: uint8 image in, output_0/1/2 100-slot tensors out
    (obj_det_edet4_trtserver.py:24-29), boxes scaled to the WIRE image's
    pixel space."""
    _, reg = pipeline_and_registry
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, 256, 256, 3), np.uint8)
    out = reg.infer("edetlite4", {"image": img})
    assert out["output_0"].shape == (1, 100, 4)
    assert out["output_1"].shape == (1, 100)
    assert out["output_2"].shape == (1, 100)
    boxes = out["output_0"][0]
    # wire image is 256x256, det input 128x128 -> boxes scaled back
    assert float(boxes.max()) <= 256.0 + 1e-3
    scores = out["output_1"][0]
    assert (np.diff(scores[scores > 0]) <= 1e-6).all()  # score-sorted


def test_modified_and_ensemble_no_person_fallback(pipeline_and_registry):
    """threshold 0.99 on random weights -> no person slots: dynamic
    empty filtered_boxes, the conv.py:72-79 single ZERO crop, and
    ensemble heatmaps of that zero crop (length 1)."""
    _, reg = pipeline_and_registry
    rng = np.random.default_rng(2)
    inputs = {
        "edet_input_image": rng.integers(0, 256, (1, 128, 128, 3), np.uint8),
        "det_thres": np.array([0.99], np.float32),
        "det_xy_change": np.array([7.0, 0.0], np.float32),
    }
    out = reg.infer("edetlite4_modified", inputs)
    assert out["detection_boxes"].shape == (100, 4)
    assert out["filtered_boxes"].shape == (0, 4)
    assert out["human_crops"].shape == (1, 3, 64, 64)
    assert (out["human_crops"] == 0).all()

    ens = reg.infer("ensemble_edet4_person_det_pose", inputs)
    assert ens["ENSEMBLE_OUTPUT_FILTER_DET_BOXES"].shape == (0, 4)
    assert ens["ENSEMBLE_OUTPUT_HEATMAPS"].shape == (1, 17, 16, 16)
    assert np.isfinite(ens["ENSEMBLE_OUTPUT_HEATMAPS"]).all()


def test_modified_with_detections(pipeline_and_registry):
    """threshold 0 accepts every detection -> up to 3 person slots with
    normalized expanded boxes and /255 crops (conv.py:31-70)."""
    _, reg = pipeline_and_registry
    rng = np.random.default_rng(3)
    inputs = {
        "edet_input_image": rng.integers(0, 256, (1, 128, 128, 3), np.uint8),
        "det_thres": np.array([0.0], np.float32),
        "det_xy_change": np.array([7.0, 0.0], np.float32),
    }
    out = reg.infer("edetlite4_modified", inputs)
    n = out["filtered_boxes"].shape[0]
    # random weights: some anchors always score > 0; person-class slots
    # may or may not survive, but shapes must stay consistent
    assert out["human_crops"].shape == (max(n, 1), 3, 64, 64)
    if n:
        fb = out["filtered_boxes"]
        assert (fb >= 0).all() and (fb <= 1).all()  # normalized

    ens = reg.infer("ensemble_edet4_person_det_pose", inputs)
    assert ens["ENSEMBLE_OUTPUT_HEATMAPS"].shape == (max(n, 1), 17, 16, 16)
    assert ens["ENSEMBLE_OUTPUT_FILTER_DET_BOXES"].shape == (n, 4)
    # the two are DIFFERENT jit programs over bf16 compute — low bits may
    # diverge with fusion order; boxes are normalized [0,1]
    np.testing.assert_allclose(
        ens["ENSEMBLE_OUTPUT_FILTER_DET_BOXES"], out["filtered_boxes"],
        atol=2e-2,
    )


def test_certified_fallback_upgrades_unshared_slots(monkeypatch, tmp_path):
    """Slots that would random-init fall back to the committed synthetic-
    certified checkpoints when present (metadata flips, load stays lazy);
    conftest disables this for every other test via
    HBPE_DISABLE_CERTIFIED_FALLBACK."""
    from human_body_proportion_estimation_tpu.models import weights as W
    from human_body_proportion_estimation_tpu.serve.registry import (
        build_registry,
    )

    monkeypatch.delenv("HBPE_DISABLE_CERTIFIED_FALLBACK", raising=False)
    ck = str(tmp_path / "certified.npz")
    np.savez_compressed(ck, **{"det/x": np.zeros(1, np.float16),
                               "pose/x": np.zeros(1, np.float16)})
    monkeypatch.setattr(W, "default_certified_checkpoint", lambda: ck)
    monkeypatch.setattr(
        W, "default_certified_bottomup_checkpoint", lambda: ck)

    reg = build_registry(config=tiny_config())   # nothing shared
    idx = {r["name"]: r for r in reg.index()}
    for name in ("hrnet", "higherhrnet", "edetlite4", "edetlite4_modified",
                 "ensemble_edet4_person_det_pose"):
        assert idx[name]["weights"] == "synthetic-certified", name
        assert not idx[name]["loaded"]           # npz untouched until load
    assert idx["yolov5m"]["weights"] == "random"  # no yolo checkpoint yet
    assert idx["ssd_mobilenet"]["weights"] == "real"

    # with the files absent (the default-path case pre-certification)
    monkeypatch.setattr(W, "default_certified_checkpoint",
                        lambda: str(tmp_path / "missing.npz"))
    monkeypatch.setattr(W, "default_certified_bottomup_checkpoint",
                        lambda: str(tmp_path / "missing.npz"))
    reg2 = build_registry(config=tiny_config())
    idx2 = {r["name"]: r for r in reg2.index()}
    assert idx2["hrnet"]["weights"] == "random"
    assert idx2["higherhrnet"]["weights"] == "random"


def test_ssd_mobilenet_real_weight_slot(pipeline_and_registry):
    """`ssd_mobilenet`: the repository's always-real-weights model (the
    reference's checked-in ssd.tflite) with the TFLite_Detection_
    PostProcess wire contract (human_detector.py:31-38)."""
    _, reg = pipeline_and_registry
    assert {r["name"]: r["weights"] for r in reg.index()}[
        "ssd_mobilenet"] == "real"
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (1, 240, 320, 3), np.uint8)
    out = reg.infer("ssd_mobilenet", {"image": img})
    assert out["detection_boxes"].shape == (1, 10, 4)
    assert out["detection_scores"].shape == (1, 10)
    assert out["detection_classes"].shape == (1, 10)
    n = float(out["num_detections"][0])
    assert 0 <= n <= 10
    boxes = out["detection_boxes"][0]
    # normalized coords (un-clipped TFLite_Detection_PostProcess
    # semantics: slight out-of-[0,1] spill is legal)
    assert np.isfinite(boxes).all()
    assert (boxes > -0.5).all() and (boxes < 1.5).all()
    scores = out["detection_scores"][0]
    assert (np.diff(scores[scores > 0]) <= 1e-6).all()  # score-sorted


def test_higherhrnet_dual_outputs(pipeline_and_registry):
    """`higherhrnet` emits output_1 (heatmaps+AE tags, 1/4 res) and
    output_2 (heatmaps, 1/2 res) — pose_est_hrnet_trtserver.py:26-28."""
    _, reg = pipeline_and_registry
    rng = np.random.default_rng(4)
    x = rng.random((1, 3, 64, 64), np.float32)
    out = reg.infer("higherhrnet", {"input": x})
    assert out["output_1"].shape == (1, 34, 16, 16)
    assert out["output_2"].shape == (1, 17, 32, 32)


def test_requested_outputs_filter(pipeline_and_registry):
    """Triton requested-outputs semantics: ask for a subset, get exactly
    that subset (triton_utils.py:44-49)."""
    _, reg = pipeline_and_registry
    rng = np.random.default_rng(5)
    x = rng.random((1, 3, 64, 64), np.float32)
    out = reg.infer("higherhrnet", {"input": x}, ["output_2"])
    assert set(out) == {"output_2"}


def test_validation_errors(pipeline_and_registry):
    _, reg = pipeline_and_registry
    x = np.zeros((1, 3, 64, 64), np.float32)
    with pytest.raises(KeyError, match="not found"):
        reg.infer("nope", {"input": x})
    with pytest.raises(ValueError, match="no input"):
        reg.infer("hrnet", {"wrong": x})
    with pytest.raises(ValueError, match="missing input"):
        reg.infer("hrnet", {})
    with pytest.raises(ValueError, match="dtype"):
        reg.infer("hrnet", {"input": x.astype(np.float64)})
    with pytest.raises(ValueError, match="incompatible"):
        reg.infer("hrnet", {"input": np.zeros((1, 3, 32, 64), np.float32)})
    with pytest.raises(ValueError, match="max_batch_size"):
        reg.infer("hrnet", {"input": np.zeros((8, 3, 64, 64), np.float32)})
    with pytest.raises(ValueError, match="no output"):
        reg.infer("hrnet", {"input": x}, ["nope"])


def test_model_version_surface(pipeline_and_registry):
    """Triton serves each model from a `<name>/1/` version directory and
    tritonclient passes model_version on every call (reference
    triton_utils.py:21-31). The registry mirrors that: a constant version
    '1', advertised in metadata/index, '' (latest) accepted everywhere,
    anything else NOT_FOUND-shaped (KeyError)."""
    _, reg = pipeline_and_registry
    meta = reg.metadata("hrnet")
    assert meta["versions"] == ["1"]
    assert reg.metadata("hrnet", "1") == meta
    assert all(row["version"] == "1" for row in reg.index())
    with pytest.raises(KeyError, match="no version '2'"):
        reg.metadata("hrnet", "2")
    with pytest.raises(KeyError, match="no version"):
        reg.config("hrnet", "0")
    with pytest.raises(KeyError, match="no version"):
        reg.infer("hrnet", {"input": np.zeros((1, 3, 64, 64), np.float32)},
                  version="2")


def test_model_config_is_triton_shaped(pipeline_and_registry):
    """The model-*config* document tritonclient fetches separately from
    metadata (reference triton_utils.py:27-31; parse_model_grpc reads
    config.input[i].format + config.max_batch_size, :55-73). Triton
    conventions: config dims EXCLUDE the batch dim when max_batch_size>0;
    instance_group.count is the dp degree; dynamic_batching carries the
    coalescing window."""
    _, reg = pipeline_and_registry
    cfg = reg.config("hrnet")
    assert cfg["max_batch_size"] == 4
    (inp,) = cfg["input"]
    # metadata shape [-1, 3, 64, 64] -> config dims [3, 64, 64]
    assert inp == {"name": "input", "data_type": "TYPE_FP32",
                   "format": "FORMAT_NONE", "dims": [3, 64, 64]}
    assert cfg["instance_group"] == [{"count": 1, "kind": "KIND_MODEL"}]
    db = cfg["dynamic_batching"]
    assert db["preferred_batch_size"] == [4]
    assert db["max_queue_delay_microseconds"] > 0

    # fixed-signature model (max_batch_size == 0): dims = full shape,
    # no dynamic_batching block
    cfg = reg.config("edetlite4")
    assert cfg["max_batch_size"] == 0
    assert cfg["input"][0]["dims"] == [1, -1, -1, 3]
    assert "dynamic_batching" not in cfg
    with pytest.raises(KeyError, match="not found"):
        reg.config("nope")


def test_per_model_dynamic_batching(pipeline_and_registry):
    """Concurrent ModelInfer requests to a batched model coalesce into
    fewer device launches (Triton dynamic_batching semantics) with
    per-request results identical to the equivalent combined batch."""
    import concurrent.futures as cf

    pipe, reg = pipeline_and_registry
    entry = reg._models["hrnet"]
    entry.batch_timeout_ms = 100.0  # generous window so all 4 coalesce
    entry.shutdown()                # drop any batcher built with old timeout
    rng = np.random.default_rng(9)
    xs = [rng.random((1, 3, 64, 64), np.float32) for _ in range(4)]

    # direct combined batch: the oracle for per-row results (the same
    # padded bucket the coalesced launch uses)
    combined = reg.infer("hrnet", {"input": np.concatenate(xs)})["output"]

    before = entry.batches_run
    with cf.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(
            lambda x: reg.infer("hrnet", {"input": x})["output"], xs
        ))
    launches = entry.batches_run - before
    assert launches < 4, f"no coalescing: {launches} launches for 4 requests"
    for i, out in enumerate(outs):
        assert out.shape == (1, 17, 16, 16)
        # rows from a fully coalesced launch are bitwise equal to the
        # combined batch; partially coalesced launches may land in a
        # different pow2 bucket -> bf16 fusion noise, so allow tolerance
        np.testing.assert_allclose(
            out[0], combined[i], atol=0.05 * float(np.abs(combined).max())
        )
    entry.shutdown()


def test_explicit_load_unload(pipeline_and_registry):
    """Triton repository-control semantics: load eagerly builds, unload
    frees (model stays registered), inference after unload reloads."""
    _, reg = pipeline_and_registry

    def loaded(name):
        return {r["name"]: r["loaded"] for r in reg.index()}[name]

    reg.load("higherhrnet")
    assert loaded("higherhrnet")
    reg.unload("higherhrnet")
    assert not loaded("higherhrnet")
    # still servable: next inference rebuilds transparently
    x = np.zeros((1, 3, 64, 64), np.float32)
    out = reg.infer("higherhrnet", {"input": x})
    assert out["output_2"].shape == (1, 17, 32, 32)
    assert loaded("higherhrnet")
    reg.unload("higherhrnet")
    with pytest.raises(KeyError):
        reg.unload("nope")


def test_higherhrnet_shares_bottomup_pipeline_params():
    """A --bottom-up server's registry must serve the PIPELINE's
    HigherHRNet params through the named slot (BottomUpPipeline.model is
    the bare module — no rewrap needed). Seeded away from the registry's
    standalone fallback so sharing is observable."""
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.pipeline.bottomup import (
        BottomUpPipeline,
    )
    from human_body_proportion_estimation_tpu.serve.registry import (
        build_registry,
    )

    pipe = BottomUpPipeline(config=tiny_config(), rng_seed=5)
    reg = build_registry(pipe, include=["higherhrnet"])
    rng = np.random.default_rng(10)
    x = rng.random((1, 3, 64, 64), np.float32)
    out = reg.infer("higherhrnet", {"input": x})

    def direct_program(v, t):
        o = pipe.model.apply(v, jnp.transpose(t, (0, 2, 3, 1)))
        return (jnp.moveaxis(o["output_1"], -1, 1),
                jnp.moveaxis(o["output_2"], -1, 1))

    d1, d2 = jax.jit(direct_program)(pipe.pose_vars, jnp.asarray(x))
    np.testing.assert_allclose(out["output_1"], np.asarray(d1),
                               rtol=0, atol=0)
    np.testing.assert_allclose(out["output_2"], np.asarray(d2),
                               rtol=0, atol=0)


def test_registry_stats(pipeline_and_registry):
    _, reg = pipeline_and_registry
    stats = reg.stats()
    assert set(stats) == REFERENCE_MODELS
    # hrnet has been inferred by earlier tests in this module
    assert stats["hrnet"]["loaded"] is True
    assert stats["hrnet"]["batches_run"] >= 1
    assert stats["yolov5m"] == {"loaded": False, "batches_run": 0}


def test_inference_statistics():
    """Triton get_inference_statistics semantics (registry.statistics):
    inference_count counts ROWS of successful requests, execution_count
    counts device launches (a coalesced batch is one), success/fail
    track request wall time, batch_stats histograms rows-per-launch, and
    validation failures land in `fail` without touching the
    success-side counters."""
    from human_body_proportion_estimation_tpu.serve.registry import (
        ModelEntry,
        ModelRegistry,
        TensorSpec,
    )

    def build():
        def run(inputs):
            return {"y": inputs["x"] * 2.0}

        return run

    reg = ModelRegistry()
    reg.register(ModelEntry(
        name="m", platform="test",
        inputs=[TensorSpec("x", "FP32", (-1, 4))],
        outputs=[TensorSpec("y", "FP32", (-1, 4))],
        max_batch_size=4, weights="random", build=build,
        batch_timeout_ms=1.0,
    ))

    # zeroed before any traffic
    (row,) = reg.statistics("m")["model_stats"]
    assert row["inference_count"] == 0 and row["execution_count"] == 0
    assert row["last_inference"] == 0 and row["batch_stats"] == []

    reg.infer("m", {"x": np.zeros((2, 4), np.float32)})   # 2 rows
    reg.infer("m", {"x": np.ones((1, 4), np.float32)})    # 1 row
    with pytest.raises(ValueError):
        reg.infer("m", {"bogus": np.zeros((1, 4), np.float32)})

    (row,) = reg.statistics("m")["model_stats"]
    assert row["name"] == "m" and row["version"] == "1"
    assert row["inference_count"] == 3          # rows, not requests
    assert row["execution_count"] == 2          # sequential -> 2 launches
    s = row["inference_stats"]
    assert s["success"]["count"] == 2 and s["success"]["ns"] > 0
    assert s["fail"]["count"] == 1 and s["fail"]["ns"] > 0
    assert s["compute_infer"]["count"] == 2
    assert s["success"]["ns"] >= s["queue"]["ns"]
    by_rows = {b["batch_size"]: b["compute_infer"]["count"]
               for b in row["batch_stats"]}
    assert by_rows == {1: 1, 2: 1}
    assert row["last_inference"] > 0

    # all-models form + unknown name/version errors (NOT_FOUND at edges)
    assert [m["name"] for m in reg.statistics()["model_stats"]] == ["m"]
    with pytest.raises(KeyError):
        reg.statistics("nope")
    with pytest.raises(KeyError):
        reg.statistics("m", version="2")

    # a coalesced launch: N concurrent single-row requests -> fewer
    # launches than requests, every row still counted
    import concurrent.futures as cf

    before_exec = row["execution_count"]
    xs = [np.full((1, 4), i, np.float32) for i in range(4)]
    with cf.ThreadPoolExecutor(4) as ex:
        list(ex.map(lambda x: reg.infer("m", {"x": x}), xs))
    (row,) = reg.statistics("m")["model_stats"]
    assert row["inference_count"] == 7
    assert row["execution_count"] - before_exec < 4  # coalesced
    reg.shutdown()


def test_coalescing_respects_row_cap_and_shape_groups():
    """_run_coalesced must (a) never combine more rows than
    max_batch_size into one launch — the batcher caps request count, not
    rows — and (b) group by non-batch dims so dynamic-dim models can mix
    input sizes in one window without a concatenate crash."""
    from human_body_proportion_estimation_tpu.serve.registry import (
        ModelEntry,
        TensorSpec,
    )

    launches = []

    def build():
        def run(inputs):
            launches.append(inputs["x"].shape)
            return {"y": inputs["x"] * 2.0}

        return run

    e = ModelEntry(
        name="m", platform="test",
        inputs=[TensorSpec("x", "FP32", (-1, -1))],
        outputs=[TensorSpec("y", "FP32", (-1, -1))],
        max_batch_size=4, weights="random", build=build,
    )
    payloads = [
        {"x": np.full((2, 4), 0, np.float32)},
        {"x": np.full((2, 4), 1, np.float32)},
        {"x": np.full((1, 4), 2, np.float32)},   # 2+2+1 > 4 -> two launches
        {"x": np.full((2, 8), 3, np.float32)},   # different dims -> own group
    ]
    results = e._run_coalesced(payloads)
    assert sorted(launches) == [(1, 4), (2, 8), (4, 4)]
    for p, r in zip(payloads, results):
        np.testing.assert_array_equal(r["y"], p["x"] * 2.0)


def test_wire_tensor_roundtrip():
    """raw-bytes tensor encoding used by the gRPC ModelInfer RPC."""
    from human_body_proportion_estimation_tpu.serve.grpc_server import (
        infer_tensor_to_np,
        np_to_infer_tensor,
    )

    rng = np.random.default_rng(6)
    for arr in (
        rng.random((2, 3, 4)).astype(np.float32),
        rng.integers(0, 256, (1, 5, 5, 3), dtype=np.uint8),
        np.array([3], np.int64),
    ):
        t = np_to_infer_tensor("x", arr)
        back = infer_tensor_to_np(t)
        assert back.dtype == arr.dtype
        np.testing.assert_array_equal(back, arr)
    # corrupted payload rejected
    t = np_to_infer_tensor("x", np.zeros((2, 2), np.float32))
    t.raw_data = t.raw_data[:-1]
    with pytest.raises(ValueError, match="raw bytes"):
        infer_tensor_to_np(t)


def test_dp_sharded_registry_matches_per_row_program():
    """`--data-parallel N` at the tensor API (the Triton `instance_group
    {count: N}` analog, reference README :71-80): a BATCHED registry model
    jitted over an 8-device 'data' mesh returns, for every request row,
    exactly what the model computes for that row alone — including request
    sizes that force padding up to a dp multiple (1 -> 8, 3 -> 8; one row
    per device, so each shard runs the batch-1 program). yolov5* and
    higherhrnet share the identical `_jit_batched_program`/`_pad_rows`
    path but are too heavy to duplicate on the CPU mesh, so hrnet stands
    in for all three.

    The reference point is deliberately the per-row direct program, not
    the single-device registry at its own (different) batch bucket:
    with random-init weights the BN running stats don't match the
    activation distribution, activations explode, and bf16 compute then
    makes different-bucket XLA programs diverge visibly — a property of
    random weights, not of the sharding."""
    import jax
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.parallel.mesh import make_mesh
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.serve.registry import (
        build_registry,
    )

    assert len(jax.devices()) >= 8
    cfg = tiny_config()
    from tests.tiny_models import tiny_edet_config, tiny_hrnet

    pipe = InferencePipeline(config=cfg, det_config=tiny_edet_config(),
                             pose=tiny_hrnet(), rng_seed=7)
    regN = build_registry(pipe, include=["hrnet"], mesh=make_mesh(8))

    @jax.jit
    def direct_row(v, t):  # batch-1 reference program
        return jnp.moveaxis(
            pipe.pose.apply(v, jnp.transpose(t, (0, 2, 3, 1))), -1, 1
        )

    rng = np.random.default_rng(3)
    try:
        for n in (1, 3):
            x = rng.random((n, 3, 64, 64), np.float32)
            out = regN.infer("hrnet", {"input": x})["output"]
            assert out.shape == (n, 17, 16, 16)
            for i in range(n):
                want = np.asarray(
                    direct_row(pipe.pose_vars, jnp.asarray(x[i][None]))
                )[0]
                np.testing.assert_allclose(out[i], want, rtol=0,
                                           atol=1e-5)
    finally:
        regN.shutdown()
