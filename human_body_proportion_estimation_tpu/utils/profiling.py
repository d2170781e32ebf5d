"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock prints
(`person_det_pose_edet4_trtserver.py:64,197-199`) with Triton metrics
explicitly disabled. This module provides the serving-grade replacements:

  * `StageTimer` — accumulating per-stage wall-time stats for host-side
    stages (decode, resize, batch, format).
  * `device_time` — honest device-program timing: forces a VALUE READBACK
    of the result before stopping the clock. Under the axon TPU tunnel,
    `block_until_ready` acknowledges dispatch long before execution
    finishes, so naive timings read ~20x fast; reading a scalar back is
    the only reliable fence (see bench.py).
  * `xla_trace` — TensorBoard-compatible XLA profiler traces
    (jax.profiler) around any code region.
"""

from __future__ import annotations

import collections
import contextlib
import threading
import time
from typing import Dict

import numpy as np


class StageTimer:
    """Thread-safe accumulating timer: `with timer.stage("decode"): ...`."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._samples: Dict[str, collections.deque] = {}
        self._window = window

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._samples.setdefault(
                    name, collections.deque(maxlen=self._window)
                ).append(dt)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out = {}
            for name, q in self._samples.items():
                arr = np.asarray(q)
                out[name] = {
                    "count": int(arr.size),
                    "mean_ms": float(arr.mean() * 1e3),
                    "p50_ms": float(np.percentile(arr, 50) * 1e3),
                    "p95_ms": float(np.percentile(arr, 95) * 1e3),
                }
            return out


def device_time(fn, *args, readback=lambda out: out, trials: int = 3):
    """Time a jitted program honestly: min wall time over `trials`, each
    fenced by converting `readback(out)` to a host value."""
    import jax.numpy as jnp

    best = float("inf")
    out = None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(readback(out)))
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
