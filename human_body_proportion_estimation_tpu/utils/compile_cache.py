"""Persistent XLA compilation cache: the TensorRT-engine-cache analog.

The reference's Triton deployment avoids per-start model builds by
shipping prebuilt engines in the model repository and marking models
READY after load (README.md:47-80, :56-64). The XLA-side equivalent of
that "build once, load fast forever" property is jax's persistent
compilation cache: compiled TPU executables are serialized to a
directory keyed by HLO hash, so every server restart (same program
shapes, same jaxlib) skips XLA compilation entirely — including through
the axon remote-compile tunnel, where first compiles of the full fused
pipeline cost minutes (measured: 227 s full prewarm, 12 s first request
without it; see BENCHMARKS.md cold-start table).

Serving artifacts (pipeline/export.py) remove model *tracing*; this
removes re-*compilation*. The two compose: artifact + warm cache +
--prewarm gives a server that is READY in seconds with every batch
bucket hot.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "hbpe_xla_cache"
)


def enable(directory: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent).

    Must be called before the first compilation to benefit it; later
    compilations benefit regardless. All entries are cached (no
    min-size/min-compile-time gates): the serving programs are few and
    large, and even millisecond-scale host programs add up through the
    remote-compile tunnel's per-program round trip.
    """
    import jax

    directory = directory or DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    repointed = (
        jax.config.jax_compilation_cache_dir is not None
        and jax.config.jax_compilation_cache_dir != directory
    )
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if repointed:
        # jax builds its persistent-cache object once, on the first
        # compilation after the cache dir is set; re-pointing the config
        # later (e.g. a server --compile-cache-dir after some earlier jit
        # already initialized the default dir) is silently ignored unless
        # the cache instance is reset. Resetting drops no compiled
        # executables — only the handle to the old directory.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
    return directory
