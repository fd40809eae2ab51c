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


def chained_device_time(step_fn, example, n_lo: int = 5, n_hi: int = 30,
                        repeats: int = 3):
    """Differential dependency-chained device timing.

    On tunneled/asynchronous backends a single chained-scan fetch costs
    (fixed dispatch+fetch RTT + n * device_time); at small n the fixed
    RTT (~29 ms over the axon tunnel) dominates and corrupts absolute
    numbers in BOTH directions (understates throughput, overstates
    small latencies). Timing two chain lengths and taking the slope
    cancels the RTT exactly.

    step_fn(x) must take the example and return a SCALAR (f32) that
    depends on every output (so nothing is dead-code-eliminated); the
    chain feeds `example + carry * 1e-20` back in to force sequential
    execution.

    Returns (device_seconds_per_iter, fixed_rtt_seconds).
    """
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def chained(x):
            def step(carry, _):
                return step_fn(x + carry * 1e-20), None

            s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return s

        float(chained(example))  # compile + warm

        def run():
            t0 = time.perf_counter()
            float(chained(example))
            return time.perf_counter() - t0

        return run

    lo, hi = make(n_lo), make(n_hi)
    t_lo = min(lo() for _ in range(repeats))
    t_hi = min(hi() for _ in range(repeats))
    dev = (t_hi - t_lo) / (n_hi - n_lo)
    return dev, max(t_lo - n_lo * dev, 0.0)
