"""Live-chip drive of the stock KServe/Triton gRPC wire protocol.

Run against an already-running server (default deployment, real TPU):

  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      human_body_proportion_estimation_tpu.serve.server --port 8080 &
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/drive_kserve_live.py

Exercises the exact call sequence the reference's drivers make through
tritonclient[grpc] (reference modules/triton_utils.py:11-34,167-171):
client -> get_model_metadata -> get_model_config -> infer(model_name),
plus repository index and server-side statistics — all through
`inference.GRPCInferenceService` (serve/kserve_grpc.py), not the hbpe
domain service. Prints one JSON document with timings for BENCHMARKS.md.
"""

import json
import time

import numpy as np

from human_body_proportion_estimation_tpu.serve.kserve_grpc import (
    KServeClient,
)

MODEL = "hrnet"


def main() -> None:
    c = KServeClient("127.0.0.1:8081")
    doc = {}

    t0 = time.time()
    doc["server_live"] = bool(c.is_server_live())
    doc["server_ready"] = bool(c.is_server_ready())
    meta = c.get_model_metadata(MODEL)
    cfg = c.get_model_config(MODEL).config
    doc["metadata"] = {
        "name": meta.name,
        "platform": meta.platform,
        "inputs": [
            {"name": t.name, "datatype": t.datatype,
             "shape": list(t.shape)}
            for t in meta.inputs
        ],
        "outputs": [
            {"name": t.name, "datatype": t.datatype,
             "shape": list(t.shape)}
            for t in meta.outputs
        ],
    }
    doc["config"] = {
        "max_batch_size": cfg.max_batch_size,
        "instance_group_count": cfg.instance_group[0].count,
        "backend": cfg.backend,
    }
    doc["metadata_s"] = round(time.time() - t0, 3)

    # metadata-driven input exactly like the reference's requestGenerator
    in_meta = meta.inputs[0]
    shape = [1] + [int(d) for d in in_meta.shape if int(d) > 0][-3:]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape, dtype=np.float32)

    t0 = time.time()
    out = c.infer(MODEL, {in_meta.name: x})
    doc["first_infer_s"] = round(time.time() - t0, 2)
    (name, arr), = out.items()
    doc["output"] = {"name": name, "shape": list(arr.shape),
                     "dtype": str(arr.dtype),
                     "finite": bool(np.isfinite(arr).all())}

    times = []
    for _ in range(10):
        t0 = time.time()
        c.infer(MODEL, {in_meta.name: x})
        times.append(time.time() - t0)
    doc["warm_infer_s"] = {
        "p50": round(float(np.percentile(times, 50)), 3),
        "min": round(min(times), 3),
    }

    stats = c.get_inference_statistics(MODEL)
    row = stats.model_stats[0]
    doc["server_stats"] = {
        "inference_count": row.inference_count,
        "execution_count": row.execution_count,
    }
    doc["repository"] = sorted(
        m.name for m in c.get_model_repository_index()
    )
    c.close()
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
