"""Persistent compilation cache (utils/compile_cache): the
TensorRT-engine-cache analog for server restarts."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from human_body_proportion_estimation_tpu.utils import compile_cache


def test_enable_populates_cache_dir(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = compile_cache.enable(str(tmp_path / "cache"))
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x) + 1.0

        out = f(jnp.ones((64, 64), jnp.float32))
        assert np.isfinite(np.asarray(out)).all()
        # the compiled executable was serialized into the directory
        assert any(name.endswith("-cache") for name in os.listdir(d)), (
            os.listdir(d)
        )
    finally:
        # jax config is process-global; don't leave later tests writing
        # their executables into this test's tmp dir
        jax.config.update("jax_compilation_cache_dir", prev)


def test_server_flag_wires_cache(tmp_path, monkeypatch):
    """--compile-cache-dir reaches compile_cache.enable before any model
    build (parse-only check: invoke main with --help-free dry parse via
    the enable hook)."""
    calls = []
    monkeypatch.setattr(
        compile_cache, "enable",
        lambda directory=None: calls.append(directory) or str(tmp_path),
    )
    from human_body_proportion_estimation_tpu.serve import server

    # parse args exactly as main() does, stopping before model build by
    # pointing at a nonexistent artifact dir (fails fast, after the cache
    # hook has run)
    try:
        server.main([
            "--artifact-dir", str(tmp_path / "missing"),
            "--compile-cache-dir", str(tmp_path / "xc"),
        ])
    except FileNotFoundError:
        pass
    assert calls == [str(tmp_path / "xc")]
