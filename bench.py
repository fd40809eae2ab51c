"""Benchmark: KP2Dtiny-N multitask inference FPS/chip at 320x240.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 2000 FPS/chip on TPU v5e, so
vs_baseline = fps / 2000.

Measurement method: N_ITER model invocations are chained inside ONE jitted
lax.scan with a data dependency between iterations, and a single scalar is
fetched at the end. This forces strictly sequential on-device execution and
is immune to async-dispatch measurement artifacts (on tunneled PJRT
backends, jax.block_until_ready can return before execution finishes,
inflating naive loop timings by >100x).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def wait_for_backend(max_wait_s: float = 900.0, probe_timeout_s: float = 120.0):
    """Wait (bounded) for the tunneled TPU backend to come up.

    The axon tunnel occasionally drops for minutes at a time; a bench
    started during an outage would otherwise block in backend init and
    then die with 'Unable to initialize backend'. Probe in a SUBPROCESS
    (in-process jax caches a failed backend) until jax.devices() answers
    or the budget runs out, then proceed either way."""
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                check=True, timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            # don't start a probe that can't finish inside the budget
            if time.time() + 15.0 + probe_timeout_s > deadline:
                print(f"# backend probe failed {attempt}x over "
                      f"{time.time() - (deadline - max_wait_s):.0f}s; "
                      f"proceeding anyway", file=sys.stderr)
                return False
            time.sleep(15.0)


def main():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.postprocess import post_process

    H, W = 240, 320
    on_tpu = jax.default_backend() == "tpu"
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    def one(x):
        out = model.apply(variables, x, False)
        if on_tpu:
            # fused Pallas postprocess kernel (1.65x end-to-end vs the XLA
            # gather path; golden-tested identical outputs)
            from nanovs_slam_tpu.ops.pallas.postprocess_kernel import \
                fused_postprocess_pallas

            score, coord, desc = fused_postprocess_pallas(
                out["score"], out["coord"], out["feat"], H, W, cfg.cell,
                cfg.cross_ratio)
            seg = jnp.argmax(out["seg"], -1)
            return (score.sum() + coord.sum() + desc.sum()
                    + seg.astype(jnp.float32).sum()
                    + out["vlad"].astype(jnp.float32).sum())
        post = post_process(out, H, W, cfg.cell, cfg.cross_ratio,
                            eval_mode=True)
        # reduce every output to a scalar so nothing is dead-code-eliminated
        return (post["score"].astype(jnp.float32).sum()
                + post["feat"].astype(jnp.float32).sum()
                + post["coord"].astype(jnp.float32).sum()
                + post["seg"].astype(jnp.float32).sum()
                + post["vlad"].astype(jnp.float32).sum())

    # DIFFERENTIAL chained timing (utils/profiling.chained_device_time):
    # one fetch of a dependency-chained scan costs (harness RTT + n *
    # device_time) on the tunneled backend — the fixed RTT is ~29 ms here
    # and skewed round-1 numbers at n=10. The two-length slope measures
    # pure device time; the RTT is reported for transparency.
    from nanovs_slam_tpu.utils.profiling import chained_device_time

    n_lo, n_hi = (5, 30) if on_tpu else (1, 3)
    best_fps = 0.0
    for B in ([64, 128, 256] if on_tpu else [4]):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32)
        dt, rtt = chained_device_time(one, x, n_lo, n_hi)
        fps = B / dt
        best_fps = max(best_fps, fps)
        print(f"# B={B}: {dt * 1e3:.2f} ms/iter -> {fps:.1f} FPS "
              f"(harness rtt {rtt * 1e3:.1f} ms)", file=sys.stderr)

    print(json.dumps({
        "metric": "kp2dtiny_N_multitask_fps_per_chip_320x240",
        "value": round(best_fps, 1),
        "unit": "FPS",
        "vs_baseline": round(best_fps / 2000.0, 4),
    }))


if __name__ == "__main__":
    wait_for_backend()
    main()
