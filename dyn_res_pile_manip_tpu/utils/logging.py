"""Logging / metering utilities (reference utils.py:346-384) plus a manual
scoped timer that mirrors the reference's CUDA-event timing with JAX
block-until-ready semantics."""
from __future__ import annotations

import sys
import time


class Tee:
    """Duplicate stdout into a log file."""

    def __init__(self, name: str, mode: str = "w"):
        self.file = open(name, mode)
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)

    def flush(self):
        self.file.flush()
        self.stdout.flush()

    def close(self):
        sys.stdout = self.stdout
        self.file.close()


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class BlockingTimer:
    """Wall-clock timer that blocks on JAX async dispatch, so timings match
    the reference's cuda-event measurements (planners.py:341-358)."""

    def __init__(self):
        self.total_ms = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays):
        import jax

        if arrays:
            jax.block_until_ready(arrays)
        self.total_ms += (time.perf_counter() - self._t0) * 1000.0
        return self.total_ms
