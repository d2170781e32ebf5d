"""Named-model registry: the Triton model-repository role.

The reference's serving surface is not one endpoint — it is a *repository*
of named models behind Triton's tensor-level gRPC API, addressed by name
from every driver:

  * ``ensemble_edet4_person_det_pose``
    (`person_det_pose_edet4_trtserver.py:30`) — the det->crop->pose DAG,
    outputs ``ENSEMBLE_OUTPUT_FILTER_DET_BOXES`` / ``ENSEMBLE_OUTPUT_HEATMAPS``
    (`:22-23`).
  * ``edetlite4`` / ``edetlite4_modified`` (`obj_det_edet4_trtserver.py:166`)
    — raw detector (``output_0/1/2``, `:24-29`) and the model-surgery graph
    (``detection_boxes/scores/classes``, ``filtered_boxes``, ``human_crops``,
    reference `models/conv.py:82-86`).
  * ``yolov5m`` (`obj_det_yolov5_trtserver.py:180`) — ``output``
    [B, 25200, 85] (`:41`).
  * ``hrnet`` / ``higherhrnet`` (`pose_est_hrnet_trtserver.py:22-28`) —
    ``output`` / ``output_1``+``output_2`` heatmap tensors.
  * ``ssd_mobilenet`` — beyond-reference slot: the reference runs its
    TFLite alternative detector client-side (`modules/human_detector.py`),
    not in Triton; registered here with the TFLite_Detection_PostProcess
    wire contract so tensor-level clients get an always-REAL-weights
    model (the checked-in ssd.tflite).

Clients introspect each model's inputs/outputs/max_batch_size before
building requests (`modules/triton_utils.py:54-72` ``parse_model_grpc``).
This module provides that repository natively: every model is a jittable
XLA program wrapped in a numpy-tensor runner, registered under the
reference's model name with Triton-style metadata (KServe-v2 dtype strings),
and served through the gRPC ``ModelInfer`` / ``ModelMetadata`` /
``RepositoryIndex`` RPCs (serve/grpc_server.py) plus the HTTP
``/v2/models`` read-only mirror.

TPU-native design notes (deliberate divergences, not omissions):
  * Fixed shapes on device, dynamic shapes on the wire: programs run with
    3 padded person slots / 100 detection slots and validity masks; the
    host boundary slices to the dynamic counts the reference emits
    (e.g. ``filtered_boxes`` [n<=3, 4]).
  * Detector models accept any input H x W and host-resize to the
    pipeline's detector input; pixel-space outputs are scaled back to the
    wire image's dimensions (the reference requires the client to resize,
    `obj_det_edet4_trtserver.py:15-18`).
  * Models are built lazily on first inference (params + first compile);
    metadata is served without loading. The repository index marks
    everything READY (it will serve) and reports whether it is loaded.
  * The no-detection fallback of `models/conv.py:72-79` (a single all-zero
    crop, so HRNet runs on zeros) is replicated exactly: invalid person
    slots are masked to zero before the pose stage and the host returns
    ``human_crops``/heatmaps of length max(n, 1).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# Triton/KServe-v2 datatype strings <-> numpy (triton_utils builds inputs
# from these names via tritonclient's metadata, reference :37-51)
TRITON_TO_NP = {
    "UINT8": np.uint8,
    "INT32": np.int32,
    "INT64": np.int64,
    "FP16": np.float16,
    "FP32": np.float32,
    "FP64": np.float64,
    "BOOL": np.bool_,
}
NP_TO_TRITON = {np.dtype(v): k for k, v in TRITON_TO_NP.items()}

# Every model serves exactly one version, "1" — the analog of the
# reference repo's Triton model directories `<name>/1/` (README :71-80).
# tritonclient passes model_version="" (latest) or "1" on every call
# (reference modules/triton_utils.py:21-31); anything else is NOT_FOUND.
MODEL_VERSION = "1"


def check_version(name: str, version: str) -> None:
    """Raise KeyError (-> NOT_FOUND at both edges) for a version other
    than '' (latest) or '1' — Triton's unknown-version behavior."""
    if version not in ("", MODEL_VERSION):
        raise KeyError(
            f"model '{name}' has no version '{version}' "
            f"(available: ['{MODEL_VERSION}'])"
        )


@dataclass(frozen=True)
class TensorSpec:
    """Wire tensor contract. shape uses -1 for dynamic dims; the leading
    dim is the batch dim when the model reports max_batch_size > 0."""

    name: str
    datatype: str
    shape: Tuple[int, ...]


@dataclass
class ModelEntry:
    """One named model: metadata + a lazily built numpy runner.

    Batched models (max_batch_size > 0) get per-model dynamic batching —
    Triton's `dynamic_batching` config behavior (reference README :71-80):
    concurrent ModelInfer requests coalesce along the batch dim into ONE
    device launch after at most `batch_timeout_ms`, then results split
    back per request. Fixed-signature models (max_batch_size == 0)
    dispatch directly.
    """

    name: str
    platform: str               # descriptive ("jax_xla"), Triton-config analog
    inputs: List[TensorSpec]
    outputs: List[TensorSpec]
    max_batch_size: int         # 0 = no batch dim (fixed batch-1 signature)
    weights: str                # "real" | "random"
    build: Callable[[], Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]]
    batch_timeout_ms: float = 4.0
    # data-parallel degree the runner shards its batch over (Triton
    # `instance_group {count: N}` analog); surfaced in the model config
    dp: int = 1
    # hook invoked after unload() (e.g. releasing a core shared between
    # sibling entries once none of them is loaded)
    on_unload: Optional[Callable[[], None]] = None
    _runner: Optional[Callable] = field(default=None, repr=False)
    _batcher: Optional[Any] = field(default=None, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    batches_run: int = 0        # observability: device launches so far

    # -- per-model inference statistics (Triton get_inference_statistics
    # analog; tritonclient get_inference_statistics / GET
    # /v2/models/<name>/stats). Cumulative since process start, guarded
    # by _stats_lock (requests arrive on edge threads, launches run on
    # the batcher thread). --
    _stats_lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False
    )
    inference_count: int = 0    # rows successfully inferred (Triton counts
    #                             each inference in a batched request)
    success_count: int = 0      # successful requests
    success_ns: int = 0         # cumulative request wall time (success)
    fail_count: int = 0
    fail_ns: int = 0
    compute_input_ns: int = 0   # host-side batch assembly (concat)
    compute_infer_ns: int = 0   # device launch wall
    compute_output_ns: int = 0  # host-side result split
    # launch wall attributed once per coalesced request: every request in
    # a shared launch waited for the full launch, so request wall minus
    # this is (approximately) time spent queued in the deadline batcher
    compute_request_ns: int = 0
    last_inference_ms: int = 0  # epoch ms of the most recent request
    # rows-per-launch -> [launch count, compute_infer ns] (batch_stats)
    batch_stats: Dict[int, List[int]] = field(default_factory=dict)

    def _record_launch(self, rows: int, n_requests: int, input_ns: int,
                       infer_ns: int, output_ns: int) -> None:
        with self._stats_lock:
            self.batches_run += 1
            self.compute_input_ns += input_ns
            self.compute_infer_ns += infer_ns
            self.compute_output_ns += output_ns
            self.compute_request_ns += (
                (input_ns + infer_ns + output_ns) * n_requests
            )
            cell = self.batch_stats.setdefault(rows, [0, 0])
            cell[0] += 1
            cell[1] += infer_ns

    def record_request(self, ok: bool, wall_ns: int, rows: int) -> None:
        with self._stats_lock:
            self.last_inference_ms = int(time.time() * 1000)
            if ok:
                self.success_count += 1
                self.success_ns += wall_ns
                self.inference_count += rows
            else:
                self.fail_count += 1
                self.fail_ns += wall_ns

    @property
    def loaded(self) -> bool:
        return self._runner is not None

    def runner(self) -> Callable:
        if self._runner is None:
            with self._lock:
                if self._runner is None:
                    self._runner = self.build()
        return self._runner

    def _run_coalesced(
        self, payloads: List[Dict[str, np.ndarray]]
    ) -> List[Dict[str, np.ndarray]]:
        """Batcher runner: concatenate queued requests along the batch
        dim and split results back per request. Requests are grouped by
        their non-batch dims (dynamic-dim models may legally mix input
        sizes) and each group is chunked so a combined launch never
        exceeds max_batch_size rows — the batcher itself counts requests,
        not rows, so multi-row requests would otherwise coalesce past the
        advertised cap into a brand-new (non-bucket) XLA compile."""
        run = self.runner()
        results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(payloads)

        def launch(idxs: List[int]) -> None:
            if len(idxs) == 1:
                t0 = time.monotonic_ns()
                results[idxs[0]] = run(payloads[idxs[0]])
                rows = next(iter(payloads[idxs[0]].values())).shape[0]
                self._record_launch(
                    rows, 1, 0, time.monotonic_ns() - t0, 0
                )
                return
            sizes = [next(iter(payloads[i].values())).shape[0]
                     for i in idxs]
            t0 = time.monotonic_ns()
            concat = {
                name: np.concatenate([payloads[i][name] for i in idxs])
                for name in payloads[idxs[0]]
            }
            t1 = time.monotonic_ns()
            out = run(concat)
            t2 = time.monotonic_ns()
            off = 0
            for i, n in zip(idxs, sizes):
                results[i] = {k: v[off:off + n] for k, v in out.items()}
                off += n
            self._record_launch(
                sum(sizes), len(idxs), t1 - t0, t2 - t1,
                time.monotonic_ns() - t2,
            )

        groups: Dict[Any, List[int]] = {}
        for i, p in enumerate(payloads):
            key = tuple(sorted((k, v.shape[1:]) for k, v in p.items()))
            groups.setdefault(key, []).append(i)
        for idxs in groups.values():
            chunk: List[int] = []
            rows = 0
            for i in idxs:
                n = next(iter(payloads[i].values())).shape[0]
                if chunk and rows + n > self.max_batch_size:
                    launch(chunk)
                    chunk, rows = [], 0
                chunk.append(i)
                rows += n
            if chunk:
                launch(chunk)
        return results  # every index filled: groups partition the payloads

    def dispatch(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.max_batch_size <= 0:
            t0 = time.monotonic_ns()
            wall0 = time.time_ns()
            out = self.runner()(inputs)
            self._record_launch(1, 1, 0, time.monotonic_ns() - t0, 0)
            # fixed-signature models bypass the batcher, so the Triton
            # trace extension's sampling hook lives here instead
            from human_body_proportion_estimation_tpu.serve import tracing

            if tracing.TRACER.sample():
                tracing.TRACER.record(
                    self.name,
                    {"COMPUTE_START": wall0, "COMPUTE_END": time.time_ns()},
                    batch_size=1,
                )
            return out
        # read the batcher reference ONCE per attempt — an unload() racing
        # this call may null the field; a request that lands in a batcher
        # being shut down gets a clean "shut down" error and retries on a
        # fresh one
        for _ in range(2):
            batcher = self._batcher
            if batcher is None:
                with self._lock:
                    if self._batcher is None:
                        from human_body_proportion_estimation_tpu.serve.batching import (  # noqa: E501
                            DynamicBatcher,
                        )

                        self._batcher = DynamicBatcher(
                            self._run_coalesced,
                            max_batch=self.max_batch_size,
                            batch_timeout_ms=self.batch_timeout_ms,
                            trace_name=self.name,
                        )
                    batcher = self._batcher
            try:
                return batcher.infer(inputs)
            except RuntimeError as e:
                if "shut down" not in str(e):
                    raise
                with self._lock:
                    if self._batcher is batcher:
                        self._batcher = None
        raise RuntimeError(
            f"model '{self.name}' is being unloaded; retry the request"
        )

    def shutdown(self):
        if self._batcher is not None:
            self._batcher.shutdown()
            self._batcher = None

    def unload(self):
        """Drop the runner (and its device params, unless shared with the
        serving pipeline) + batcher; the next inference rebuilds."""
        with self._lock:
            batcher, self._batcher = self._batcher, None
            self._runner = None
        if batcher is not None:
            # outside the lock: shutdown drains + fails queued futures and
            # may wait on an in-flight launch
            batcher.shutdown()
        if self.on_unload is not None:
            self.on_unload()


class ModelRegistry:
    """Name -> ModelEntry map with Triton-shaped introspection + dispatch."""

    def __init__(self):
        self._models: Dict[str, ModelEntry] = {}

    def register(self, entry: ModelEntry) -> None:
        self._models[entry.name] = entry

    def names(self) -> List[str]:
        return sorted(self._models)

    def index(self) -> List[Dict[str, Any]]:
        """RepositoryIndex rows (tritonclient get_model_repository_index
        analog): every registered model is servable -> READY."""
        return [
            {
                "name": m.name,
                "version": MODEL_VERSION,
                "state": "READY",
                "loaded": m.loaded,
                "weights": m.weights,
            }
            for m in (self._models[n] for n in self.names())
        ]

    def metadata(self, name: str, version: str = "") -> Dict[str, Any]:
        """The fields `parse_model_grpc` consumes (reference
        triton_utils.py:54-72): input/output names, dtypes, shapes,
        max_batch_size. `versions` mirrors Triton's single `<name>/1/`
        model directory (reference README :71-80)."""
        check_version(name, version)
        m = self._get(name)
        return {
            "name": m.name,
            "versions": [MODEL_VERSION],
            "platform": m.platform,
            "max_batch_size": m.max_batch_size,
            "weights": m.weights,
            "inputs": [
                {"name": t.name, "datatype": t.datatype,
                 "shape": list(t.shape)}
                for t in m.inputs
            ],
            "outputs": [
                {"name": t.name, "datatype": t.datatype,
                 "shape": list(t.shape)}
                for t in m.outputs
            ],
        }

    def config(self, name: str, version: str = "") -> Dict[str, Any]:
        """Triton model-*config* analog — the second document tritonclient
        fetches alongside metadata (`get_model_config`, reference
        triton_utils.py:27-31; `parse_model_grpc` reads `config.input[i]
        .format` and `config.max_batch_size`, :55-73).

        Triton config conventions kept: `dims` EXCLUDE the batch dim when
        max_batch_size > 0 (metadata shapes include it as -1);
        `instance_group.count` is the data-parallel degree the runner
        shards its coalesced batch over (`--data-parallel N`, the
        `instance_group {count: N}` analog); `dynamic_batching` carries
        the deadline-batcher's queue delay.
        """
        check_version(name, version)
        m = self._get(name)

        def _tensors(specs: List[TensorSpec]) -> List[Dict[str, Any]]:
            return [
                {
                    "name": t.name,
                    "data_type": f"TYPE_{t.datatype}",
                    "format": "FORMAT_NONE",
                    "dims": list(
                        t.shape[1:] if m.max_batch_size > 0 else t.shape
                    ),
                }
                for t in specs
            ]

        out: Dict[str, Any] = {
            "name": m.name,
            "platform": m.platform,
            "max_batch_size": m.max_batch_size,
            "version_policy": {"latest": {"num_versions": 1}},
            "input": _tensors(m.inputs),
            "output": _tensors(m.outputs),
            "instance_group": [
                {"count": m.dp, "kind": "KIND_MODEL"}
            ],
        }
        if m.max_batch_size > 0:
            out["dynamic_batching"] = {
                "preferred_batch_size": [m.max_batch_size],
                "max_queue_delay_microseconds": int(
                    m.batch_timeout_ms * 1000
                ),
            }
        return out

    def infer(
        self,
        name: str,
        inputs: Dict[str, np.ndarray],
        output_names: Optional[Sequence[str]] = None,
        version: str = "",
    ) -> Dict[str, np.ndarray]:
        """Run a named model on numpy tensors (triton_client.infer analog).

        Validates tensor names/dtypes against metadata, dispatches to the
        (lazily built) runner, optionally filters requested outputs —
        Triton's requested-outputs semantics (triton_utils.py:44-49).
        """
        check_version(name, version)
        m = self._get(name)
        t_req = time.monotonic_ns()
        try:
            out = self._infer_checked(m, inputs, output_names)
        except Exception:
            m.record_request(False, time.monotonic_ns() - t_req, 0)
            raise
        rows = (next(iter(inputs.values())).shape[0]
                if m.max_batch_size > 0 and inputs else 1)
        m.record_request(True, time.monotonic_ns() - t_req, rows)
        return out

    def _infer_checked(
        self,
        m: ModelEntry,
        inputs: Dict[str, np.ndarray],
        output_names: Optional[Sequence[str]],
    ) -> Dict[str, np.ndarray]:
        name = m.name
        expected = {t.name: t for t in m.inputs}
        unknown = set(inputs) - set(expected)
        if unknown:
            raise ValueError(
                f"model '{name}' has no input(s) {sorted(unknown)}; "
                f"expects {sorted(expected)}"
            )
        missing = set(expected) - set(inputs)
        if missing:
            raise ValueError(
                f"model '{name}' missing input(s) {sorted(missing)}"
            )
        coerced = {}
        for tname, arr in inputs.items():
            spec = expected[tname]
            want = TRITON_TO_NP[spec.datatype]
            arr = np.asarray(arr)
            if arr.dtype != want:
                raise ValueError(
                    f"input '{tname}' dtype {arr.dtype} != {spec.datatype}"
                )
            if len(arr.shape) != len(spec.shape):
                raise ValueError(
                    f"input '{tname}' rank {len(arr.shape)} != "
                    f"{len(spec.shape)} (shape spec {list(spec.shape)})"
                )
            for got, want_d in zip(arr.shape, spec.shape):
                if want_d != -1 and got != want_d:
                    raise ValueError(
                        f"input '{tname}' shape {list(arr.shape)} "
                        f"incompatible with {list(spec.shape)}"
                    )
            coerced[tname] = arr
        if m.max_batch_size > 0:
            b = next(iter(coerced.values())).shape[0]
            if b > m.max_batch_size:
                raise ValueError(
                    f"batch {b} exceeds model '{name}' "
                    f"max_batch_size {m.max_batch_size}"
                )
        out = m.dispatch(coerced)
        if output_names:
            bad = set(output_names) - set(out)
            if bad:
                raise ValueError(
                    f"model '{name}' has no output(s) {sorted(bad)}"
                )
            out = {k: out[k] for k in output_names}
        return out

    def _get(self, name: str) -> ModelEntry:
        if name not in self._models:
            raise KeyError(
                f"model '{name}' not found; repository has {self.names()}"
            )
        return self._models[name]

    def stats(self) -> Dict[str, Dict[str, Any]]:
        """Per-model observability for /metrics: loaded state + device
        launches so far (coalesced batches count as one)."""
        return {
            n: {
                "loaded": self._models[n].loaded,
                "batches_run": self._models[n].batches_run,
            }
            for n in self.names()
        }

    def statistics(self, name: str = "",
                   version: str = "") -> Dict[str, Any]:
        """Per-model inference statistics — the Triton
        `get_inference_statistics` / `GET /v2/models/<name>/stats`
        document (the reference deploys Triton, whose clients scrape this
        alongside metadata/config; `perf_analyzer` reads it between
        passes). Empty name -> every model, Triton's all-models form.

        Shape per model (cumulative since process start):
          * `inference_count` — rows successfully inferred (each row of a
            batched request counts, Triton semantics);
          * `execution_count` — device launches (coalesced batches count
            once: inference_count / execution_count is the effective
            batching ratio the reference tunes via `dynamic_batching`);
          * `inference_stats.success/fail` — request count + cumulative
            request wall ns; `compute_input/infer/output` — per-launch
            host assembly / device launch / result split ns;
            `queue` — request wall not attributable to this request's
            launch (time spent in the deadline batcher's window), derived
            as success.ns minus launch wall attributed per request;
          * `batch_stats` — per rows-per-launch {count, compute_infer ns}.
        """
        if name:
            check_version(name, version)
            self._get(name)
            names = [name]
        else:
            names = self.names()
        out = []
        for n in names:
            m = self._models[n]
            with m._stats_lock:
                queue_ns = max(0, m.success_ns - m.compute_request_ns)
                out.append({
                    "name": n,
                    "version": MODEL_VERSION,
                    "last_inference": m.last_inference_ms,
                    "inference_count": m.inference_count,
                    "execution_count": m.batches_run,
                    "inference_stats": {
                        "success": {"count": m.success_count,
                                    "ns": m.success_ns},
                        "fail": {"count": m.fail_count, "ns": m.fail_ns},
                        "queue": {"count": m.success_count,
                                  "ns": queue_ns},
                        "compute_input": {"count": m.batches_run,
                                          "ns": m.compute_input_ns},
                        "compute_infer": {"count": m.batches_run,
                                          "ns": m.compute_infer_ns},
                        "compute_output": {"count": m.batches_run,
                                           "ns": m.compute_output_ns},
                    },
                    "batch_stats": [
                        {"batch_size": b,
                         "compute_infer": {"count": c[0], "ns": c[1]}}
                        for b, c in sorted(m.batch_stats.items())
                    ],
                })
        return {"model_stats": out}

    def load(self, name: str) -> None:
        """Eagerly build a model's runner (params + program objects) —
        Triton's explicit load_model repository-control RPC. The first
        inference still pays its batch bucket's XLA compile."""
        self._get(name).runner()

    # Triton's `unload_dependents` repository-extension parameter: for an
    # ensemble, also unload its composing models (the reference's ensemble
    # chains edetlite4_modified -> hrnet through Triton's ensemble
    # scheduler, conv.py + README :71-80; here the fused program replaces
    # the DAG, but the composing slots are still separately addressable
    # repository entries with their own runners).
    ENSEMBLE_DEPENDENTS = {
        "ensemble_edet4_person_det_pose": ("edetlite4_modified", "hrnet"),
    }

    def unload(self, name: str, unload_dependents: bool = False) -> None:
        """Triton's unload_model: free the lazily built runner (device
        params are released unless shared with the serving pipeline);
        the model stays registered and reloads on next use.
        `unload_dependents` (the advertised model_repository extension
        parameter, tritonclient unload_model(unload_dependents=True))
        additionally unloads the target's composing models."""
        self._get(name).unload()
        if unload_dependents:
            for dep in self.ENSEMBLE_DEPENDENTS.get(name, ()):
                if dep in self._models:
                    self._models[dep].unload()

    def shutdown(self):
        for m in self._models.values():
            m.shutdown()


# --------------------------------------------------------------------- #
# runner builders
# --------------------------------------------------------------------- #


def _pad_pow2(n: int, cap: int) -> int:
    """Power-of-two batch bucket — the serving pipeline's policy
    (pipeline/host.py:_pad_batch), reused so bucket fixes stay single-
    sourced."""
    from human_body_proportion_estimation_tpu.pipeline.host import (
        _pad_batch,
    )

    return _pad_batch(n, cap)


def _pad_rows(n: int, cap: int, dp: int) -> int:
    """Batch bucket that is also a multiple of the data-parallel degree —
    a dp-sharded program needs every batch divisible by the 'data' axis."""
    b = _pad_pow2(n, cap)
    if dp > 1:
        b = max(b, dp)
        if b % dp:
            b = ((b + dp - 1) // dp) * dp
    return b


def _mesh_dp(mesh) -> int:
    """Data-parallel degree an entry's runner will shard over (matches
    `_jit_batched_program`'s mesh handling)."""
    return int(mesh.shape["data"]) if mesh is not None else 1


def _jit_batched_program(program, variables, mesh):
    """jit a `(variables, x_batch) -> outputs` program; with a mesh the
    params are replicated and the batch dim sharded over 'data' — the
    Triton `instance_group {count: N}` analog at the tensor API (reference
    README :71-80): one coalesced registry batch then spans N chips, same
    scheme as the domain endpoint (`pipeline/host.py:_jit_kwargs`).

    Returns (jitted, placed_variables, dp_degree)."""
    import jax

    if mesh is None:
        return jax.jit(program), variables, 1
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    variables = jax.device_put(variables, rep)
    jitted = jax.jit(program, in_shardings=(
        jax.tree.map(lambda _: rep, variables),
        NamedSharding(mesh, P("data")),
    ))
    return jitted, variables, int(mesh.shape["data"])


def _device_put_default(tree):
    import jax

    return jax.device_put(tree, jax.local_devices()[0])


def _init_on_cpu(fn):
    """Random param init on host CPU (fast trace), device_put once —
    same pattern as pipeline/host.py InferencePipeline.__init__."""
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = fn(jax.random.PRNGKey(0))
    return _device_put_default(variables)


def _certified_fallback(slot: str, arch_ok: bool = True):
    """Lazy loader for a committed synthetic-certified checkpoint slot
    (`slot`: "pose" -> top-down HRNet-W32, "det" -> EfficientDet-Lite4,
    "higherhrnet" -> bottom-up), or None when the file is absent or the
    entry's architecture doesn't match what was certified. Registry
    entries fall back to these when they would otherwise random-init: the
    reference never serves untrained weights (README.md:13-26 makes the
    checkpoint download mandatory), so neither does this named-model
    repository. Only the cheap existence check runs at registry build;
    the npz read happens at lazy model-load time.

    `HBPE_DISABLE_CERTIFIED_FALLBACK=1` turns this off (tests/conftest.py
    sets it: tiny-config CPU suites must random-init, not pull the full
    production checkpoints)."""
    import os as _os

    if not arch_ok or _os.environ.get("HBPE_DISABLE_CERTIFIED_FALLBACK"):
        return None

    from human_body_proportion_estimation_tpu.models import weights as W

    path = (W.default_certified_bottomup_checkpoint()
            if slot == "higherhrnet" else W.default_certified_checkpoint())
    if not _os.path.exists(path):
        return None

    def load():
        det_t, pose_t = W.load_compact_checkpoint(path)
        return _device_put_default(det_t if slot == "det" else pose_t)

    return load


def _resize_u8(img: np.ndarray, width: int, height: int) -> np.ndarray:
    if img.shape[0] == height and img.shape[1] == width:
        return img
    from human_body_proportion_estimation_tpu.pipeline.host import (
        resize_for_detector,
    )

    return resize_for_detector(img, width, height)


def _hrnet_entry(cfg, pose=None, pose_vars=None,
                 weights: str = "random", mesh=None) -> ModelEntry:
    """`hrnet`: f32 NCHW crops -> "output" heatmaps [B, 17, 96, 72]
    (reference pose_est_hrnet_trtserver.py:22-25 reads "output"; the wire
    layout is the reference's channel-first ONNX convention — transposed
    to NHWC on-device for the MXU-friendly layout this framework uses)."""
    ch, cw = cfg.pose.crop_height, cfg.pose.crop_width
    k = cfg.pose.num_keypoints
    max_batch = cfg.serve.max_batch
    fallback = None
    if pose_vars is None:
        fallback = _certified_fallback("pose", cfg.pose.name == "hrnet_w32")
        if fallback is not None:
            weights = "synthetic-certified"

    def build():
        import jax
        import jax.numpy as jnp

        from human_body_proportion_estimation_tpu.models.hrnet import (
            create_hrnet,
        )

        model = pose
        variables = pose_vars
        if model is None:
            model = create_hrnet(cfg.pose.name)
            variables = fallback() if fallback is not None else _init_on_cpu(
                lambda rng: model.init(
                    rng, jnp.zeros((1, ch, cw, 3), jnp.float32)
                )
            )

        def program(v, x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1))
            hm = model.apply(v, x)
            return jnp.moveaxis(hm, -1, 1)

        jitted, variables, dp = _jit_batched_program(program, variables,
                                                     mesh)

        def run(inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
            x = inputs["input"]
            n = x.shape[0]
            b = _pad_rows(n, max_batch, dp)
            if b != n:
                x = np.concatenate(
                    [x, np.zeros((b - n,) + x.shape[1:], x.dtype)]
                )
            out = np.asarray(jitted(variables, jnp.asarray(x)))
            return {"output": out[:n]}

        return run

    return ModelEntry(
        name="hrnet",
        platform="jax_xla",
        inputs=[TensorSpec("input", "FP32", (-1, 3, ch, cw))],
        outputs=[TensorSpec("output", "FP32",
                            (-1, k, ch // 4, cw // 4))],
        max_batch_size=max_batch,
        weights=weights,
        build=build,
        batch_timeout_ms=cfg.serve.batch_timeout_ms,
        dp=_mesh_dp(mesh),
    )


def _higherhrnet_entry(cfg, pose=None, pose_vars=None,
                       weights: str = "random", mesh=None) -> ModelEntry:
    """`higherhrnet`: f32 NCHW image -> "output_1" (K heatmaps + K AE tags,
    1/4 res) and "output_2" (K heatmaps, 1/2 res) — the tensor contract the
    reference reads (pose_est_hrnet_trtserver.py:22-28 uses output_2 only;
    output_1 carries the AE tags the bottom-up pipeline consumes). When the
    server runs `--bottom-up`, the pipeline's own HigherHRNet + params are
    shared (BottomUpPipeline.model is the bare module)."""
    k = cfg.pose.num_keypoints
    max_batch = cfg.serve.max_batch
    fallback = None
    if pose_vars is None:
        # the certified bottom-up checkpoint is the default HigherHRNet
        # config — exactly what the model-is-None branch below builds
        fallback = _certified_fallback("higherhrnet")
        if fallback is not None:
            weights = "synthetic-certified"

    def build():
        import jax
        import jax.numpy as jnp

        from human_body_proportion_estimation_tpu.models.higherhrnet import (
            HigherHRNet,
        )

        model = pose
        variables = pose_vars
        if model is None:
            model = HigherHRNet()
            variables = fallback() if fallback is not None else _init_on_cpu(
                lambda rng: model.init(
                    rng, jnp.zeros((1, 128, 128, 3), jnp.float32)
                )
            )

        def program(v, x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1))
            out = model.apply(v, x)
            return (
                jnp.moveaxis(out["output_1"], -1, 1),
                jnp.moveaxis(out["output_2"], -1, 1),
            )

        jitted, variables, dp = _jit_batched_program(program, variables,
                                                     mesh)

        def run(inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
            x = inputs["input"]
            n = x.shape[0]
            b = _pad_rows(n, max_batch, dp)
            if b != n:
                x = np.concatenate(
                    [x, np.zeros((b - n,) + x.shape[1:], x.dtype)]
                )
            o1, o2 = jitted(variables, jnp.asarray(x))
            return {
                "output_1": np.asarray(o1)[:n],
                "output_2": np.asarray(o2)[:n],
            }

        return run

    return ModelEntry(
        name="higherhrnet",
        platform="jax_xla",
        inputs=[TensorSpec("input", "FP32", (-1, 3, -1, -1))],
        outputs=[
            TensorSpec("output_1", "FP32", (-1, 2 * k, -1, -1)),
            TensorSpec("output_2", "FP32", (-1, k, -1, -1)),
        ],
        max_batch_size=max_batch,
        weights=weights,
        build=build,
        batch_timeout_ms=cfg.serve.batch_timeout_ms,
        dp=_mesh_dp(mesh),
    )


def _yolo_entry(cfg, variant: str = "yolov5m", shared_model=None,
                shared_vars=None, weights: str = "random",
                mesh=None) -> ModelEntry:
    """`yolov5m`/`yolov5s`: "images" f32 NCHW [B,3,640,640] (already /255,
    reference obj_det_yolov5_trtserver.py:30-37) -> "output" [B, 25200, 85]
    decoded predictions (the layout its postprocess reads, :40-44). When
    the server's detector is the matching YoloBackend, its model + params
    are shared."""
    size = 640
    max_batch = cfg.serve.max_batch

    def build():
        import jax
        import jax.numpy as jnp

        from human_body_proportion_estimation_tpu.models.yolov5 import (
            YOLOV5L,
            YOLOV5M,
            YOLOV5S,
            YoloV5,
            decode_predictions,
        )

        model = shared_model
        variables = shared_vars
        if model is None:
            variants = {
                "yolov5s": YOLOV5S, "yolov5m": YOLOV5M, "yolov5l": YOLOV5L,
            }
            model = YoloV5(config=variants[variant])
            variables = _init_on_cpu(
                lambda rng: model.init(
                    rng, jnp.zeros((1, size, size, 3), jnp.float32)
                )
            )

        def program(v, x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1))
            heads = model.apply(v, x)
            return decode_predictions(heads)

        jitted, variables, dp = _jit_batched_program(program, variables,
                                                     mesh)

        def run(inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
            x = inputs["images"]
            n = x.shape[0]
            b = _pad_rows(n, max_batch, dp)
            if b != n:
                x = np.concatenate(
                    [x, np.zeros((b - n,) + x.shape[1:], x.dtype)]
                )
            out = np.asarray(jitted(variables, jnp.asarray(x)))
            return {"output": out[:n]}

        return run

    n_pred = sum((size // s) ** 2 * 3 for s in (8, 16, 32))  # 25200
    return ModelEntry(
        name=variant,
        platform="jax_xla",
        inputs=[TensorSpec("images", "FP32", (-1, 3, size, size))],
        outputs=[TensorSpec("output", "FP32", (-1, n_pred, 85))],
        max_batch_size=max_batch,
        weights=weights,
        build=build,
        batch_timeout_ms=cfg.serve.batch_timeout_ms,
        dp=_mesh_dp(mesh),
    )


def _ssd_entry(cfg, model=None, det_vars=None) -> ModelEntry:
    """`ssd_mobilenet`: the reference's TFLite alternative detector as a
    repository model — the one slot whose weights are ALWAYS real (the
    checked-in ssd.tflite, reference `modules/human_detector.py:10`).
    The wire contract mirrors TFLite_Detection_PostProcess outputs the
    reference reads (`human_detector.py:31-38`): normalized y1x1y2x2
    boxes, 0-based background-stripped classes (person == 0), scores,
    num_detections. Beyond-reference as a *named* model: the reference
    runs this detector client-side, not in Triton — registered here so
    tensor-level clients get a real-weight slot."""
    nd = 10  # TFLite_Detection_PostProcess max_detections

    def build():
        import jax
        import jax.numpy as jnp

        from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (
            SSDMobileNetV1,
            ssd_postprocess,
        )

        net = model
        variables = det_vars
        if net is None:
            from human_body_proportion_estimation_tpu.models.tflite_import import (  # noqa: E501
                load_ssd_weights,
            )

            net = SSDMobileNetV1()
            v, anchors = load_ssd_weights()
            variables = _device_put_default({
                "params": jax.tree.map(jnp.asarray, v["params"]),
                "anchors": jnp.asarray(anchors),
            })

        def program(v, img_u8):  # [1, 300, 300, 3] uint8
            f = img_u8[0].astype(jnp.float32)
            box_regs, logits = net.apply({"params": v["params"]}, f[None])
            det = ssd_postprocess(box_regs[0], logits[0], v["anchors"])
            return det.boxes, det.scores, det.classes, det.valid

        jitted = jax.jit(program)

        def run(inputs):
            img = _resize_u8(inputs["image"][0], 300, 300)[None]
            boxes, scores, classes, valid = (
                np.asarray(t) for t in jitted(variables, jnp.asarray(img))
            )
            return {
                "detection_boxes": boxes[None].astype(np.float32),
                "detection_classes": classes[None].astype(np.float32),
                "detection_scores": scores[None].astype(np.float32),
                "num_detections": np.array([valid.sum()], np.float32),
            }

        return run

    return ModelEntry(
        name="ssd_mobilenet",
        platform="jax_xla",
        inputs=[TensorSpec("image", "UINT8", (1, -1, -1, 3))],
        outputs=[
            TensorSpec("detection_boxes", "FP32", (1, nd, 4)),
            TensorSpec("detection_classes", "FP32", (1, nd)),
            TensorSpec("detection_scores", "FP32", (1, nd)),
            TensorSpec("num_detections", "FP32", (1,)),
        ],
        max_batch_size=0,
        weights="real",  # ssd.tflite import — never random
        build=build,
    )


def _build_edet_core(cfg, det_config, detector=None, det_vars=None):
    """Shared lazily built detection core for the three edet models:
    UNJITTED `raw` / `modified` program bodies (each entry jits its own
    composition) producing the 100-slot raw tensors plus the
    person-filtered / expanded / cropped stages of `models/conv.py`."""
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EfficientDet,
        postprocess,
    )
    from human_body_proportion_estimation_tpu.ops import (
        boxes as box_ops,
        crop as crop_ops,
    )
    from human_body_proportion_estimation_tpu.pipeline.full import (
        select_persons,
    )

    h, w = cfg.detector.input_height, cfg.detector.input_width
    model = detector
    variables = det_vars
    if model is None:
        from human_body_proportion_estimation_tpu.models.efficientdet import (
            EFFICIENTDET_LITE4,
        )

        fallback = _certified_fallback(
            "det", det_config == EFFICIENTDET_LITE4
        )
        model = EfficientDet(config=det_config)
        variables = fallback() if fallback is not None else _init_on_cpu(
            lambda rng: model.init(
                rng, jnp.zeros((1, h, w, 3), jnp.float32)
            )
        )

    def raw(v, img_u8):
        """[1,h,w,3] u8 -> 100-slot (boxes px yxyx, scores, classes 1-based,
        valid) — the raw `edetlite4` SavedModel contract (output[i][0],
        reference models/conv.py:16-18)."""
        f = img_u8.astype(jnp.float32)
        cls_logits, box_regs = model.apply(v, f)
        return postprocess(
            cls_logits[0], box_regs[0], (h, w), model.config,
            iou_threshold=cfg.detector.iou_threshold,
            top_k=cfg.detector.nms_top_k,
        )

    def modified(v, img_u8, det_thres, det_xy_change):
        """The `edetlite4_modified` graph (models/conv.py:14-86): person
        filter -> score threshold -> top-3 -> bbox expand by +/-xy ->
        normalize -> /255 crop 384x288 -> NCHW, plus the raw tensors."""
        boxes, scores, classes, valid = raw(v, img_u8)
        pboxes, pscores, pvalid = select_persons(
            boxes, scores, classes, valid, det_thres[0],
            cfg.detector.person_class_id, cfg.detector.max_persons,
        )
        boxes_norm = box_ops.expand_clip_normalize_yxyx(
            pboxes, det_xy_change[0], det_xy_change[1], h, w,
        )
        crops = crop_ops.crop_and_resize(
            img_u8[0].astype(jnp.float32) / 255.0, boxes_norm,
            cfg.pose.crop_height, cfg.pose.crop_width,
        )
        # conv.py:72-79 no-detection fallback: HRNet sees ZEROS, not a
        # zero-area crop's samples — mask invalid slots exactly
        crops = jnp.where(pvalid[:, None, None, None], crops, 0.0)
        crops_nchw = jnp.transpose(crops, (0, 3, 1, 2))
        return boxes, scores, classes, boxes_norm, crops_nchw, pvalid

    return model, variables, raw, modified


def _edet_entries(cfg, det_config, detector=None, det_vars=None,
                  pose=None, pose_vars=None,
                  det_weights: str = "random",
                  pose_weights: str = "random") -> List[ModelEntry]:
    """`edetlite4`, `edetlite4_modified`, `ensemble_edet4_person_det_pose`
    — sharing one lazily built detector core (and the serving pipeline's
    loaded params when available)."""
    h, w = cfg.detector.input_height, cfg.detector.input_width
    ch, cw = cfg.pose.crop_height, cfg.pose.crop_width
    k = cfg.pose.num_keypoints
    p = cfg.detector.max_persons
    state: Dict[str, Any] = {}
    lock = threading.Lock()

    # metadata mirrors the lazy certified-checkpoint fallbacks the build
    # paths below take (_build_edet_core / build_ensemble)
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE4,
    )

    if det_vars is None and det_weights == "random" and _certified_fallback(
        "det", det_config == EFFICIENTDET_LITE4
    ) is not None:
        det_weights = "synthetic-certified"
    pose_fallback = None
    if pose_vars is None and pose_weights == "random":
        pose_fallback = _certified_fallback(
            "pose", cfg.pose.name == "hrnet_w32"
        )
        if pose_fallback is not None:
            pose_weights = "synthetic-certified"

    def core():
        with lock:
            if "core" not in state:
                state["core"] = _build_edet_core(
                    cfg, det_config, detector, det_vars
                )
        return state["core"]

    def prep(img_wire: np.ndarray):
        """Wire image [1,H,W,3] u8 -> det-input-sized batch + the scale
        factors mapping det-input pixels back to wire pixels."""
        wire_h, wire_w = img_wire.shape[1:3]
        img = _resize_u8(img_wire[0], w, h)[None]
        scale = np.array(
            [wire_h / h, wire_w / w, wire_h / h, wire_w / w], np.float32
        )
        return img, scale

    def build_raw():
        import jax
        import jax.numpy as jnp

        _, variables, raw, _ = core()
        jitted = jax.jit(raw)

        def run(inputs):
            img, scale = prep(inputs["image"])
            boxes, scores, classes, _valid = (
                np.asarray(t) for t in jitted(variables, jnp.asarray(img))
            )
            return {
                "output_0": (boxes * scale)[None],
                "output_1": scores[None],
                "output_2": classes[None],
            }

        return run

    def build_modified():
        import jax
        import jax.numpy as jnp

        _, variables, _, modified = core()
        jitted = jax.jit(modified)

        def run(inputs):
            img, scale = prep(inputs["edet_input_image"])
            boxes, scores, classes, boxes_norm, crops, pvalid = (
                np.asarray(t) for t in jitted(
                    variables, jnp.asarray(img),
                    jnp.asarray(inputs["det_thres"]),
                    jnp.asarray(inputs["det_xy_change"]),
                )
            )
            n = int(pvalid.sum())
            human_crops = (
                crops[:n] if n
                else np.zeros((1, 3, ch, cw), np.float32)  # conv.py:72-79
            )
            return {
                "detection_boxes": boxes * scale,
                "detection_scores": scores,
                "detection_classes": classes,
                "filtered_boxes": boxes_norm[:n],  # normalized: scale-free
                "human_crops": human_crops,
            }

        return run

    def build_ensemble():
        import jax
        import jax.numpy as jnp

        from human_body_proportion_estimation_tpu.models.hrnet import (
            create_hrnet,
        )

        _, variables, _, modified = core()
        pmodel = pose
        pvars = pose_vars
        if pmodel is None:
            pmodel = create_hrnet(cfg.pose.name)
            pvars = (
                pose_fallback() if pose_fallback is not None
                else _init_on_cpu(
                    lambda rng: pmodel.init(
                        rng, jnp.zeros((1, ch, cw, 3), jnp.float32)
                    )
                )
            )

        def program(dv, pv, img, det_thres, det_xy_change):
            _, _, _, boxes_norm, crops_nchw, valid = modified(
                dv, img, det_thres, det_xy_change
            )
            crops = jnp.transpose(crops_nchw, (0, 2, 3, 1))
            hm = pmodel.apply(pv, crops)
            return boxes_norm, jnp.moveaxis(hm, -1, 1), valid

        jitted = jax.jit(program)

        def run(inputs):
            img, _scale = prep(inputs["edet_input_image"])
            boxes_norm, heatmaps, valid = (
                np.asarray(t) for t in jitted(
                    variables, pvars, jnp.asarray(img),
                    jnp.asarray(inputs["det_thres"]),
                    jnp.asarray(inputs["det_xy_change"]),
                )
            )
            n = int(valid.sum())
            return {
                # normalized expanded person boxes, de-normalized by the
                # CLIENT against its image dims (driver :142-145)
                "ENSEMBLE_OUTPUT_FILTER_DET_BOXES": boxes_norm[:n],
                # n==0 -> heatmaps of the single zero crop, like the
                # reference ensemble running hrnet on conv.py's fallback
                "ENSEMBLE_OUTPUT_HEATMAPS": heatmaps[:max(n, 1)],
            }

        return run

    mod_inputs = [
        TensorSpec("edet_input_image", "UINT8", (1, -1, -1, 3)),
        TensorSpec("det_thres", "FP32", (1,)),
        TensorSpec("det_xy_change", "FP32", (2,)),
    ]
    nd = 100  # EfficientDet max_detections (conv.py:16-18 "100,4")
    entries = [
        ModelEntry(
            name="edetlite4",
            platform="jax_xla",
            inputs=[TensorSpec("image", "UINT8", (1, -1, -1, 3))],
            outputs=[
                TensorSpec("output_0", "FP32", (1, nd, 4)),
                TensorSpec("output_1", "FP32", (1, nd)),
                TensorSpec("output_2", "FP32", (1, nd)),
            ],
            max_batch_size=0,
            weights=det_weights,
            build=build_raw,
        ),
        ModelEntry(
            name="edetlite4_modified",
            platform="jax_xla",
            inputs=mod_inputs,
            outputs=[
                TensorSpec("detection_boxes", "FP32", (nd, 4)),
                TensorSpec("detection_scores", "FP32", (nd,)),
                TensorSpec("detection_classes", "FP32", (nd,)),
                TensorSpec("filtered_boxes", "FP32", (-1, 4)),
                TensorSpec("human_crops", "FP32", (-1, 3, ch, cw)),
            ],
            max_batch_size=0,
            weights=det_weights,
            build=build_modified,
        ),
        ModelEntry(
            name="ensemble_edet4_person_det_pose",
            platform="jax_xla_ensemble",
            inputs=mod_inputs,
            outputs=[
                TensorSpec("ENSEMBLE_OUTPUT_FILTER_DET_BOXES", "FP32",
                           (-1, 4)),
                TensorSpec("ENSEMBLE_OUTPUT_HEATMAPS", "FP32",
                           (-1, k, ch // 4, cw // 4)),
            ],
            max_batch_size=0,
            weights=(
                # weakest slot wins; non-random origins ("real",
                # "synthetic-certified") propagate when they agree
                "random" if "random" in (det_weights, pose_weights)
                else det_weights if det_weights == pose_weights
                else "mixed"
            ),
            build=build_ensemble,
        ),
    ]

    def release_core():
        # the three entries share one lazily built detector core; free it
        # (params included, unless they came from the serving pipeline)
        # only when NONE of them still holds a runner — per-entry unload
        # alone cannot release memory a sibling is using
        with lock:
            if not any(e.loaded for e in entries):
                state.pop("core", None)

    for e in entries:
        e.on_unload = release_core
    return entries


def build_registry(pipeline=None, config=None,
                   include: Optional[Sequence[str]] = None,
                   mesh=None) -> ModelRegistry:
    """Assemble the default repository (the reference's model-repo roster,
    README :71-80), sharing the serving pipeline's already loaded models/
    params where they match so registry inference adds no device memory.

    `include`: restrict to a subset of model names (tests, small deploys).
    `mesh`: jax.sharding.Mesh with a 'data' axis — defaults to the serving
    pipeline's mesh, so `serve.server --data-parallel N` shards the
    BATCHED registry models (hrnet / higherhrnet / yolov5*) over N chips
    exactly like the domain endpoint: the Triton `instance_group
    {count: N}` analog at the tensor API (reference README :71-80). The
    batch-1-contract models (edet trio, ssd) keep their single-device
    reference signatures.
    """
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE4,
    )
    from human_body_proportion_estimation_tpu.models.hrnet import HRNet
    from human_body_proportion_estimation_tpu.utils.config import (
        PipelineConfig,
    )

    cfg = config
    pose = pose_vars = None
    hh = hh_vars = None
    det = det_vars = None
    ssd_model = ssd_vars = None
    yolo_models: Dict[str, Any] = {}  # variant -> (model, vars, weights)
    det_config = EFFICIENTDET_LITE4
    det_weights = pose_weights = "random"
    hh_weights = "random"
    if pipeline is not None:
        from human_body_proportion_estimation_tpu.models.higherhrnet import (
            HigherHRNet,
        )

        cfg = cfg or getattr(pipeline, "config", None)
        origin = getattr(pipeline, "weights_origin", {})
        p_pose = getattr(pipeline, "pose", None)
        if isinstance(p_pose, HRNet):
            pose = p_pose
            pose_vars = pipeline.pose_vars
            pose_weights = origin.get("pose", "random")
        # BottomUpPipeline serves the bare HigherHRNet as `.model` —
        # share it (and its possibly real params) with the registry slot
        p_model = getattr(pipeline, "model", None)
        if isinstance(p_model, HigherHRNet):
            hh = p_model
            hh_vars = pipeline.pose_vars
            hh_weights = origin.get("pose", "random")
        # SSD / YOLO serving backends: share their model + params too
        from human_body_proportion_estimation_tpu.models.ssd_mobilenet import (  # noqa: E501
            SSDMobileNetV1,
        )
        from human_body_proportion_estimation_tpu.models.yolov5 import (
            YOLOV5M,
            YOLOV5S,
            YoloV5,
        )

        b_model = getattr(getattr(pipeline, "backend", None), "model", None)
        if isinstance(b_model, SSDMobileNetV1):
            ssd_model = b_model
            ssd_vars = pipeline.det_vars
        if isinstance(b_model, YoloV5):
            # dataclass configs compare by value (not hashable)
            yolo_shared = ("yolov5s" if b_model.config == YOLOV5S
                           else "yolov5m" if b_model.config == YOLOV5M
                           else None)
            if yolo_shared is not None:
                yolo_models[yolo_shared] = (
                    b_model, pipeline.det_vars,
                    origin.get("detector", "random"),
                )
        backend = getattr(pipeline, "backend", None)
        det_model = getattr(backend, "detector", None)
        if det_model is not None and not getattr(
            det_model, "score_kernel", False
        ):
            # reuse only the canonical (non-Pallas-epilogue) detector:
            # registry programs need the generic prescored=False path,
            # which is identical either way, but sharing the score-kernel
            # instance would pin its mesh/person-class specialization
            det = det_model
            det_vars = pipeline.det_vars
            det_config = det_model.config
            det_weights = origin.get("detector", "random")
        elif det_model is not None:
            det_config = det_model.config
            det_vars = pipeline.det_vars
            from human_body_proportion_estimation_tpu.models.efficientdet import (  # noqa: E501
                EfficientDet,
            )

            det = EfficientDet(config=det_config)
            det_weights = origin.get("detector", "random")
    cfg = cfg or PipelineConfig()
    if mesh is None:
        mesh = getattr(pipeline, "mesh", None)

    reg = ModelRegistry()
    entries = [
        _hrnet_entry(cfg, pose, pose_vars, pose_weights, mesh=mesh),
        _higherhrnet_entry(cfg, hh, hh_vars, hh_weights, mesh=mesh),
        _yolo_entry(cfg, "yolov5m", *yolo_models.get("yolov5m", ()),
                    mesh=mesh),
        _yolo_entry(cfg, "yolov5s", *yolo_models.get("yolov5s", ()),
                    mesh=mesh),
        _ssd_entry(cfg, ssd_model, ssd_vars),
        *_edet_entries(
            cfg, det_config, det, det_vars, pose, pose_vars,
            det_weights=det_weights, pose_weights=pose_weights,
        ),
    ]
    for e in entries:
        if include is None or e.name in include:
            reg.register(e)
    return reg
