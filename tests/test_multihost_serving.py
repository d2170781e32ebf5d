"""Multi-host (DCN) serving: 2 processes x 4 virtual CPU devices run the
fused serving program lockstep over a global 8-device 'data' mesh
(parallel/multihost.py) and must reproduce the single-process result.

The reference cannot scale past one GPU/host at all (SURVEY §2.3); this
is the beyond-reference scale-out path. Gloo over localhost stands in for
DCN; on a TPU pod the same code path uses the TPU coordination service
and compiler-placed DCN collectives.

Both deployment-matrix phases (live pipeline + restored artifact) ride
ONE worker spawn (tests/multihost_worker.py runs them back to back over
the same distributed clique) — the spawn/init/compile cycle dominated
the old per-test wall time.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# heavy tier: in-test training loops / mesh programs / subprocess servers /
# oracle frameworks — deselect with -m 'not slow' for the fast ops/unit tier
pytestmark = pytest.mark.slow


from tests.multihost_common import make_batch, pipeline_kwargs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    """One 2-process worker run covering both phases; returns the packed
    results plus the artifact dir for parent-side reference restores."""
    from human_body_proportion_estimation_tpu.pipeline.export import (
        export_serving_artifact,
    )
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    tmp = tmp_path_factory.mktemp("multihost")
    pipe = InferencePipeline(**pipeline_kwargs())
    artifact_dir = export_serving_artifact(pipe, str(tmp / "art"),
                                           batch_size=1)

    port = _free_port()
    out_live = str(tmp / "live.npy")
    out_art = str(tmp / "art.npy")
    env = dict(
        os.environ,
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    # the worker composes its own XLA_FLAGS (4 local devices + the
    # suite's backend opt level); don't leak the parent's 8-device flags
    env.pop("XLA_FLAGS", None)
    script = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port),
             out_live, artifact_dir, out_art],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1500)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), (
        "worker failures:\n" + "\n----\n".join(logs)
    )
    assert "coordinator live OK" in logs[0]
    assert "worker live OK" in logs[1]
    assert "coordinator artifact OK" in logs[0]
    assert "worker artifact OK" in logs[1]
    return {
        "live": np.load(out_live),
        "artifact": np.load(out_art),
        "artifact_dir": artifact_dir,
    }


def test_two_process_serving_matches_single_process(multihost_run):
    # single-process reference on the plain (unsharded) pipeline
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )

    batch, thresholds, heights, orig_hw = make_batch()
    single = InferencePipeline(**pipeline_kwargs())
    ref = np.asarray(single._serving_program()(
        single.det_vars, single.pose_vars, jnp.asarray(batch),
        jnp.asarray(thresholds), jnp.asarray(heights),
        jnp.asarray(orig_hw),
    ))

    packed = multihost_run["live"]
    assert packed.shape == ref.shape == (8, 3, 23)
    np.testing.assert_allclose(packed, ref, rtol=1e-4, atol=1e-4)


def test_two_process_artifact_serving_matches_single_process(multihost_run):
    """Deployment-matrix corner: an exported artifact restored by TWO
    processes over the global 8-device mesh (make_multihost_artifact_
    serving) reproduces the single-process artifact restore bit-for-bit
    (each device runs the identical per-device StableHLO program)."""
    from human_body_proportion_estimation_tpu.pipeline.export import (
        ServingArtifact,
    )

    batch, thresholds, heights, orig_hw = make_batch()  # 8 = 2 hosts x 4
    ref = ServingArtifact(multihost_run["artifact_dir"])(
        batch[:1], thresholds[:1], heights[:1], orig_hw[:1]
    )

    packed = multihost_run["artifact"]
    assert packed.shape == (8, 3, 23)
    # row 0 of the global batch ran on device 0 with the same per-device
    # program and inputs as the single-process restore
    np.testing.assert_array_equal(packed[:1], ref)
