"""Multi-host (DCN) serving: one logical service sharded over the chips of
many hosts.

The reference is strictly single-GPU / single-host (SURVEY §2.3:
`docker-compose.yml:12-16` pins one device, uvicorn `workers=1`). This
module is the beyond-reference scale-out story, designed the TPU way
(scaling-book recipe): pick a global mesh, annotate shardings, let XLA
place the collectives — ICI inside a host, DCN between hosts. No NCCL/MPI
translation; the only inter-host primitives are jax.distributed's
coordination service and the compiler-inserted collectives.

Topology (multi-controller SPMD):
  * every process (host) runs the SAME program in lockstep;
  * process 0 owns the HTTP/gRPC edge and the dynamic batcher;
  * each serving step, process 0 broadcasts the prepared uint8 batch to
    all processes (`broadcast_one_to_all`, a DCN transfer), every process
    feeds its local shard of the global batch
    (`make_array_from_process_local_data`), the fused program runs
    batch-sharded over the global 'data' axis, and the packed [B, P, 23]
    result is gathered back replicated so process 0 can answer requests;
  * workers sit in `worker_loop`, which is the same broadcast/execute
    sequence with an empty edge — a zero-row batch is the shutdown
    sentinel.

On a real TPU pod slice `jax.distributed.initialize()` needs no arguments
(the TPU runtime provides coordination); on CPU/testing the coordinator
address + process ids are explicit. The CPU path is exercised end-to-end
by tests/test_multihost_serving.py with 2 processes x 4 virtual devices.

Failure model: lockstep SPMD has the standard multi-controller contract —
if any process dies mid-collective, the remaining processes' next
collective fails or times out via the jax.distributed runtime's own
health checking (missed-heartbeat detection terminates the job); this
module adds no additional recovery. For elastic serving, run independent
single-host replicas behind an external load balancer instead and keep
the global mesh for throughput scaling of one logical model — the same
tradeoff Triton makes (one server process per replica, SURVEY §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the jax.distributed coordination service.

    No-args on TPU pods (runtime-provided); explicit triple on CPU/GPU.
    Safe to call once per process, before any device use.
    """
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_data_mesh() -> Mesh:
    """1-D 'data' mesh over every chip of every host.

    Device order is jax.devices() order, which groups devices by process —
    so a batch sharded over 'data' sends contiguous slices to each host
    and the only inter-host traffic is the input broadcast + output
    gather, never intra-program collectives (the fused pipeline has no
    cross-example ops).
    """
    return Mesh(np.asarray(jax.devices()), ("data",))


def replicate_to_global(tree: Any, mesh: Mesh) -> Any:
    """Host-local pytree -> globally replicated jax.Arrays.

    Every process must hold the SAME values (same rng seed or same
    checkpoint) — standard multi-controller contract.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, tree), mesh, P()
    )


class MultiHostServing:
    """Lockstep executor for one fused serving program over a global mesh.

    `program(det_vars, pose_vars, images, thresholds, heights, orig_hw)`
    must be the packed serving forward (FusedPipeline.forward_serving).
    The global batch size must be a multiple of the mesh size; process 0
    prepares full batches (the dynamic batcher already pads to power-of-2
    buckets >= mesh size).
    """

    def __init__(self, mesh: Mesh, program: Callable, det_vars: Any,
                 pose_vars: Any, max_batch: int, max_persons: int = 3):
        from jax.experimental import multihost_utils

        self._mh = multihost_utils
        self.mesh = mesh
        self.max_batch = max_batch
        self.max_persons = max_persons
        self.det_vars = replicate_to_global(det_vars, mesh)
        self.pose_vars = replicate_to_global(pose_vars, mesh)
        self._data = NamedSharding(mesh, P("data"))
        self._rep = NamedSharding(mesh, P())
        # out replicated: every host reads the full packed result locally,
        # so process 0 needs no extra gather step
        self._program = jax.jit(
            program,
            in_shardings=(self._rep, self._rep, self._data, self._data,
                          self._data, self._data),
            out_shardings=self._rep,
        )
        self._establish_collectives()

    def _establish_collectives(self):
        """Open the global collective clique while processes are still
        time-aligned.

        The first cross-process collective pays transport setup under a
        ~30 s connect deadline; if the processes first meet only after
        independently compiling the big fused program, compile-time skew
        can blow that deadline (observed on the CPU/gloo test rig). A tiny
        sharded->replicated reduction + barrier here aligns everyone
        before any heavyweight compile."""
        tiny = jax.jit(
            jnp.sum, in_shardings=self._data, out_shardings=self._rep
        )
        local = np.zeros((len(jax.local_devices()),), np.float32)
        g = jax.make_array_from_process_local_data(
            self._data, local, (self.mesh.size,)
        )
        np.asarray(tiny(g).addressable_data(0))
        self._mh.sync_global_devices("hbpe_multihost_ready")

    @property
    def is_coordinator(self) -> bool:
        return jax.process_index() == 0

    # -- lockstep step ------------------------------------------------- #

    def _broadcast(self, batch, thresholds, heights, orig_hw):
        """DCN fan-out of the prepared host batch (process 0 -> all)."""
        return self._mh.broadcast_one_to_all(
            (batch, thresholds, heights, orig_hw),
            is_source=self.is_coordinator,
        )

    def _shard(self, arr: np.ndarray) -> jax.Array:
        """Global array from per-process local slices of a host batch."""
        n = self.mesh.size
        b = arr.shape[0]
        per = b // n
        lo = jax.process_index() * len(jax.local_devices()) * per
        hi = lo + len(jax.local_devices()) * per
        return jax.make_array_from_process_local_data(
            self._data, np.ascontiguousarray(arr[lo:hi]), arr.shape
        )

    def step(self, batch, thresholds, heights, orig_hw) -> np.ndarray:
        """One globally-sharded serving step; every process must call it
        with process 0's data reaching the rest via `_broadcast`."""
        args = [self._shard(a) for a in
                self._broadcast(batch, thresholds, heights, orig_hw)]
        packed = self._program(self.det_vars, self.pose_vars, *args)
        # replicated output: every process reads its local copy (plain
        # np.asarray would try to fetch non-addressable shards)
        return np.asarray(packed.addressable_data(0))

    # -- worker side ---------------------------------------------------- #

    def worker_loop(self):
        """Non-coordinator processes: mirror every coordinator step until
        the zero-row sentinel batch arrives."""
        assert not self.is_coordinator
        mesh_n = self.mesh.size
        while True:
            shape = self._mh.broadcast_one_to_all(
                np.zeros(4, np.int64), is_source=False
            )
            b, h, w, _ = (int(x) for x in shape)
            if b == 0:
                return
            self.step(
                np.zeros((b, h, w, 3), np.uint8),
                np.zeros((b,), np.float32),
                np.zeros((b, self.max_persons), np.float32),
                np.ones((b, 2), np.float32),
            )

    def coordinator_step(self, batch, thresholds, heights,
                         orig_hw) -> np.ndarray:
        """Process-0 step: announce the batch shape, then run the lockstep
        step (workers allocate matching dummies; the broadcast overwrites
        them with the real data)."""
        assert self.is_coordinator
        self._mh.broadcast_one_to_all(
            np.asarray(batch.shape, np.int64).copy(), is_source=True
        )
        return self.step(batch, thresholds, heights, orig_hw)

    def shutdown(self):
        """Release workers (zero-row sentinel)."""
        if self.is_coordinator:
            self._mh.broadcast_one_to_all(
                np.zeros(4, np.int64), is_source=True
            )


def make_multihost_pipeline(
    config=None, det_config=None, rng_seed: int = 0,
    det_vars: Any = None, pose_vars: Any = None, detector: str | None = None,
    pose=None,
):
    """Build (InferencePipeline, MultiHostServing) on the global mesh.

    Every process calls this with identical arguments; determinism of
    init (same seed) or a shared checkpoint dir guarantees replicated
    params are consistent across hosts. `pose`: pre-built pose model
    passthrough (InferencePipeline's escape hatch — reduced-shape tests,
    custom architectures).
    """
    from human_body_proportion_estimation_tpu.models.efficientdet import (
        EFFICIENTDET_LITE4,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    mesh = global_data_mesh()
    pipe = InferencePipeline(
        config=config,
        det_config=det_config or EFFICIENTDET_LITE4,
        rng_seed=rng_seed,
        det_vars=det_vars,
        pose_vars=pose_vars,
        detector=detector,
        mesh=mesh,
        pose=pose,
        place_params=False,
    )
    serving = MultiHostServing(
        mesh,
        pipe.fused.forward_serving,
        pipe.det_vars,
        pipe.pose_vars,
        max_batch=pipe.config.serve.max_batch,
        max_persons=pipe.config.detector.max_persons,
    )
    return pipe, serving


def make_multihost_artifact_serving(directory: str):
    """Restore a serving artifact (pipeline/export.py) and serve it
    lockstep over the global multi-host mesh.

    Completes the deployment matrix: {live-traced, artifact} x {single
    device, dp mesh, multi-host}. The per-device exported StableHLO body
    is shard_map'd over the global 'data' axis exactly as in the
    single-host dp restore (ServingArtifact(mesh=...)); the DCN edge
    (broadcast-in, replicated-out) is the same MultiHostServing lockstep.
    Every process must see the same artifact directory (shared filesystem
    or identical copies — the multi-controller analog of Triton's shared
    model repository, reference README :47-80).

    Global batch per step is fixed at artifact.batch_size x mesh.size
    (the restored program has one per-device batch shape).

    Returns (ServingArtifact, MultiHostServing).
    """
    from jax import shard_map

    from human_body_proportion_estimation_tpu.pipeline.export import (
        ServingArtifact,
    )

    mesh = global_data_mesh()
    art = ServingArtifact(directory)

    if art.mode == "bottom_up":
        def program(det_vars, pose_vars, images, thresholds, heights,
                    orig_hw):
            del det_vars, thresholds  # no detector; AE threshold is baked
            return shard_map(
                art._exported.call,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )(pose_vars, images, heights, orig_hw)
    else:
        def program(det_vars, pose_vars, images, thresholds, heights,
                    orig_hw):
            return shard_map(
                art._exported.call,
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data"),
                          P("data")),
                out_specs=P("data"),
                check_vma=False,
            )(det_vars, pose_vars, images, thresholds, heights, orig_hw)

    serving = MultiHostServing(
        mesh,
        program,
        art.det_vars if art.det_vars is not None else {},
        art.pose_vars,
        max_batch=art.batch_size * mesh.size,
        max_persons=art.meta["max_persons"],
    )
    return art, serving
