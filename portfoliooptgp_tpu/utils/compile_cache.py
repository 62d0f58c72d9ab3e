"""Persistent XLA compilation-cache setup (one canonical copy).

Through the remote-TPU tunnel every compile — including trivial eager ops —
costs a ~0.4 s RPC; cached repeats are ~free (measured 154 s → 0.8 s for a
repeat compile, and the flagship portfolio e2e drops 122.8 s → 18.5 s warm,
BENCH_NOTES round 5). Threshold 0 matters: the JAX default 2 s floor skips
exactly the tiny-op compiles that dominate pipeline wall time.

Used by the CLI, bench.py, and benchmarks/_cache.py. Override the location
with PORTFOLIOOPTGP_JAX_CACHE=<dir>, or disable with PORTFOLIOOPTGP_JAX_CACHE=0.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> str | None:
    """Configure jax's persistent compilation cache; returns the directory
    used, or None when disabled. Default location: `<repo>/.jax_cache` in a
    source checkout; `~/.cache/portfoliooptgp_tpu/jax_cache` when the
    package directory is not writable (pip install)."""
    import jax

    cache = path if path is not None else os.environ.get(
        "PORTFOLIOOPTGP_JAX_CACHE")
    if cache == "0":
        return None
    if not cache:
        pkg_parent = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if os.access(pkg_parent, os.W_OK):
            cache = os.path.join(pkg_parent, ".jax_cache")
        else:
            cache = os.path.join(os.path.expanduser("~"), ".cache",
                                 "portfoliooptgp_tpu", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return cache
