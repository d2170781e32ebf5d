"""Profiling utilities: stage timers and honest device timing."""

import time

import numpy as np

from human_body_proportion_estimation_tpu.utils.profiling import (
    StageTimer,
    device_time,
)


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(5):
        with t.stage("decode"):
            time.sleep(0.002)
    with t.stage("resize"):
        time.sleep(0.001)
    snap = t.snapshot()
    assert snap["decode"]["count"] == 5
    assert snap["decode"]["p50_ms"] >= 1.5
    assert snap["resize"]["count"] == 1
    assert set(snap["decode"]) == {"count", "mean_ms", "p50_ms", "p95_ms"}


def test_stage_timer_thread_safety():
    import threading

    t = StageTimer()

    def work():
        for _ in range(50):
            with t.stage("x"):
                pass

    threads = [threading.Thread(target=work) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert t.snapshot()["x"]["count"] == 200


def test_device_time_returns_min_and_output():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2.0)
    dt, out = device_time(f, jnp.ones((8, 8)), trials=2)
    assert dt > 0
    np.testing.assert_allclose(np.asarray(out), 2.0)
