"""Subprocess entry for tests/test_multihost_serving.py.

Usage:
    python multihost_worker.py <process_id> <num_processes> <port> <out> \
        [artifact_dir]

Joins the jax.distributed coordination service on CPU (4 virtual devices
per process — the conftest doesn't apply to subprocesses, so platform and
device count are forced here), builds the tiny fused pipeline on the
global 2x4-device 'data' mesh — or, with `artifact_dir`, restores the
exported serving artifact and serves it over the same mesh
(make_multihost_artifact_serving) — and:
  * process 0: runs one coordinator serving step on a deterministic batch
    and saves the packed [8, 3, 23] result to <out>;
  * workers: mirror the step via worker_loop until the shutdown sentinel.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import numpy as np

    from human_body_proportion_estimation_tpu.parallel import multihost as mh
    from tests.multihost_common import make_batch, tiny_config

    artifact_dir = sys.argv[5] if len(sys.argv) > 5 else None

    mh.init_multihost(f"127.0.0.1:{port}", nproc, pid)
    if artifact_dir:
        _, serving = mh.make_multihost_artifact_serving(artifact_dir)
    else:
        cfg, det_cfg = tiny_config()
        pipe, serving = mh.make_multihost_pipeline(
            config=cfg, det_config=det_cfg, rng_seed=0
        )
    assert serving.mesh.size == nproc * len(jax.local_devices())

    if serving.is_coordinator:
        batch, thresholds, heights, orig_hw = make_batch()
        packed = serving.coordinator_step(batch, thresholds, heights,
                                          orig_hw)
        serving.shutdown()
        np.save(out, packed)
        print("coordinator OK", flush=True)
    else:
        serving.worker_loop()
        print("worker OK", flush=True)


if __name__ == "__main__":
    main()
