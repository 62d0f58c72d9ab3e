"""Shared persistent-compile-cache setup for the standalone benchmarks —
delegates to the canonical package helper (utils/compile_cache.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable():
    from portfoliooptgp_tpu.utils.compile_cache import enable as _enable

    return _enable()
