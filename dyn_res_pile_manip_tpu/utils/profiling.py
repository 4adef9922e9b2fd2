"""Tracing / profiling utilities.

TPU equivalents of the reference's timing machinery: CUDA-event timers
around rollout/optimizer (planners.py:341-358,654-753) map to
``BlockingTimer`` (utils.logging); the C++ per-frame solver-stage timers
gated by g_profile (pyflex.cpp:1971-1981) map to ``trace`` below, which
captures a jax.profiler trace viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dynres_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimers:
    """Named wall-clock stage timers with exponential smoothing, like the
    reference's g_updateTime/g_renderTime (pyflex.cpp:1971-1981)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.avg_ms = {}
        self._t0 = {}

    def start(self, name: str):
        self._t0[name] = time.perf_counter()

    def stop(self, name: str, *arrays):
        import jax

        if arrays:
            jax.block_until_ready(arrays)
        ms = (time.perf_counter() - self._t0[name]) * 1000.0
        prev = self.avg_ms.get(name, ms)
        self.avg_ms[name] = prev + self.alpha * (ms - prev)
        return ms

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f} ms" for k, v in self.avg_ms.items())
