"""Subprocess entry for tests/test_multihost_serving.py.

Usage:
    python multihost_worker.py <process_id> <num_processes> <port> \
        <out_live> <artifact_dir> <out_artifact>

Joins the jax.distributed coordination service on CPU (4 virtual devices
per process — the conftest doesn't apply to subprocesses, so platform and
device count are forced here) and runs BOTH multi-host deployment-matrix
phases in one process lifetime (one spawn, one distributed init, one
collective-clique setup — the spawn cycle dominated the old two-test
wall time):

  1. live: builds the tiny fused pipeline on the global 2x4-device
     'data' mesh (make_multihost_pipeline), coordinator saves the packed
     [8, 3, 23] result to <out_live>;
  2. artifact: restores the exported serving artifact over the same mesh
     (make_multihost_artifact_serving), coordinator saves one packed row
     to <out_artifact>.

Process 0 runs coordinator steps; workers mirror via worker_loop until
each phase's shutdown sentinel.
"""

import os
import sys

# match the parent suite's compile settings (conftest.py): the workers'
# XLA:CPU compiles are the dominant cost of this test pair
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=4").strip()
_opt = os.environ.get("HBPE_PYTEST_XLA_OPT", "1")
if _opt and _opt != "default" and \
        "xla_backend_optimization_level" not in _flags:
    _flags = f"{_flags} --xla_backend_optimization_level={_opt}"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache in these workers, deliberately: XLA:CPU
# AOT entries reload unreliably across distributed-worker restarts
# (machine-feature-mismatch rejections), so on warm re-runs one process
# can recompile while its peer fast-loads — the resulting skew blows
# gloo's ~30 s collective connect deadline in _establish_collectives
# (observed DEADLINE_EXCEEDED with both shared and per-process dirs).
# Cache-less workers always compile in lockstep, which is what the
# collective-clique alignment in parallel/multihost.py assumes.


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_live, artifact_dir, out_art = sys.argv[4], sys.argv[5], sys.argv[6]
    import numpy as np

    from human_body_proportion_estimation_tpu.parallel import multihost as mh
    from tests.multihost_common import make_batch, pipeline_kwargs

    mh.init_multihost(f"127.0.0.1:{port}", nproc, pid)

    # phase 1: live pipeline over the global mesh
    pipe, serving = mh.make_multihost_pipeline(**pipeline_kwargs())
    assert serving.mesh.size == nproc * len(jax.local_devices())
    if serving.is_coordinator:
        batch, thresholds, heights, orig_hw = make_batch()
        packed = serving.coordinator_step(batch, thresholds, heights,
                                          orig_hw)
        serving.shutdown()
        np.save(out_live, packed)
        print("coordinator live OK", flush=True)
    else:
        serving.worker_loop()
        print("worker live OK", flush=True)

    # phase 2: artifact restore over the same mesh
    _, serving2 = mh.make_multihost_artifact_serving(artifact_dir)
    if serving2.is_coordinator:
        batch, thresholds, heights, orig_hw = make_batch()
        packed = serving2.coordinator_step(batch, thresholds, heights,
                                           orig_hw)
        serving2.shutdown()
        np.save(out_art, packed)
        print("coordinator artifact OK", flush=True)
    else:
        serving2.worker_loop()
        print("worker artifact OK", flush=True)


if __name__ == "__main__":
    main()
