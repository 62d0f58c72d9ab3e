"""Shared persistent-compile-cache setup for the standalone benchmarks
(bench.py and the CLI enable the same cache; see BENCH_NOTES round-5)."""
import os


def enable():
    import jax

    cache = os.environ.get(
        "PORTFOLIOOPTGP_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    if cache and cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
