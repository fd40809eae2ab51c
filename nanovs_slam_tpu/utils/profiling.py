"""Profiling / tracing utilities.

The reference's only tracing is a wall-time print decorator
(kp2dtiny.py:33-42, visual_odometry.py:14-23) plus FPS counters in
VisualOdometryStats. TPU-native equivalents:
- trace(): context manager around jax.profiler (Perfetto/XProf trace dir)
- timing decorator with device synchronization (block_until_ready) so
  reported times are real, not dispatch times
- StepTimer: per-step FPS/latency accumulator with percentiles (the
  p50 match-latency product metric, BASELINE.md).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timing(func):
    """Wall-time decorator that synchronizes device work first
    (reference timing_decorator, kp2dtiny.py:33-42 — but honest on
    asynchronous backends)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        result = jax.block_until_ready(result)
        print(f"Execution time of {func.__name__}: "
              f"{time.perf_counter() - t0:.4f} seconds")
        return result

    return wrapper


class StepTimer:
    def __init__(self):
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        yield
        self._samples.setdefault(name, []).append(
            time.perf_counter() - t0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, s in self._samples.items():
            a = np.asarray(s)
            out[name] = {"mean_ms": float(a.mean() * 1e3),
                         "p50_ms": float(np.percentile(a, 50) * 1e3),
                         "p95_ms": float(np.percentile(a, 95) * 1e3),
                         "fps": float(1.0 / max(a.mean(), 1e-9)),
                         "n": len(s)}
        return out
