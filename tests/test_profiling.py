"""utils/profiling: StepTimer percentiles + differential chained timing."""

import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.utils.profiling import StepTimer, chained_device_time


def test_step_timer_percentiles():
    t = StepTimer()
    # deterministic samples (seconds)
    t._samples["op"] = [0.001, 0.002, 0.003, 0.004, 0.100]
    stats = t.stats()["op"]
    assert stats["n"] == 5
    assert abs(stats["p50_ms"] - 3.0) < 1e-6
    assert stats["p95_ms"] > 50.0


def test_chained_device_time_runs():
    x = jnp.ones((64, 32), jnp.float32)

    def step(x):
        return (x * 2.0).sum() * 1e-20

    dev, rtt = chained_device_time(step, x, n_lo=1, n_hi=4, repeats=2)
    # the slope of a trivial op can land within timing noise of zero
    # (that is the point: per-call overhead is excluded) — assert only
    # well-formedness and the non-negative RTT clamp
    assert rtt >= 0.0
    assert np.isfinite(dev) and np.isfinite(rtt)
    assert abs(dev) < 1.0  # seconds; trivial op slope is ~0
