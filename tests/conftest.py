"""Test env: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices. The sandbox's sitecustomize
imports jax and registers the axon TPU plugin in every interpreter, so the
JAX_PLATFORMS env var is already consumed — the platform must be forced via
jax.config before any backend initialization instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU backend optimization level 1: the suite's wall time is
# dominated by XLA:CPU *compiles* of tiny test programs on the single
# shared core, not by their execution. Measured on the heaviest mesh
# module (test_sharded_serving.py, cold cache): default 222 s, level 1
# 177 s, level 0 203 s (slower — execution cost outweighs the compile
# saving). Applied suite-wide; opt out with HBPE_PYTEST_XLA_OPT='' or
# =default (empty matches the HBPE_DRYRUN_OPT convention), or pick a
# level explicitly. Numerics: every oracle-parity suite passes at
# level 1 (tolerances already absorb bf16/fusion variation).
_opt = os.environ.get("HBPE_PYTEST_XLA_OPT", "1")
if _opt and _opt != "default" and \
        "xla_backend_optimization_level" not in _flags:
    _flags = f"{_flags} --xla_backend_optimization_level={_opt}"
os.environ["XLA_FLAGS"] = _flags
# keep TF (used only as a parity oracle) off any accelerator and quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
# tiny-config CPU suites must random-init, never lazily pull the full
# committed production checkpoints (serve/registry._certified_fallback)
os.environ.setdefault("HBPE_DISABLE_CERTIFIED_FALLBACK", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite: the tiny-pipeline /
# mesh programs re-traced by many test modules compile once per
# machine instead of once per session (the suite's wall time is
# dominated by XLA:CPU compiles on the single shared core). Dedicated
# directory so TPU/server entries never mix in; override with
# HBPE_PYTEST_CACHE_DIR, disable with HBPE_PYTEST_CACHE_DIR=''.
_cache_dir = os.environ.get(
    "HBPE_PYTEST_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache",
                 "hbpe_xla_cache_pytest"),
)
if _cache_dir:
    from human_body_proportion_estimation_tpu.utils import (  # noqa: E402
        compile_cache,
    )

    compile_cache.enable(_cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
