"""Profiling hooks (SURVEY.md §5 tracing: absent in the reference; here a
thin jax.profiler wrapper plus a step timer that forces device completion)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XPlane trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that blocks on device results, for steps/s metrics."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result_getter=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            jax.block_until_ready(out["result"])
        self.times.append(time.perf_counter() - t0)

    @property
    def mean_s(self):
        return sum(self.times) / max(len(self.times), 1)

    def steps_per_s(self):
        return 1.0 / self.mean_s if self.times else 0.0
