"""Benchmark: KP2Dtiny-N multitask inference FPS/chip at 320x240.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} (the LAST
such line on stdout is the headline; earlier ones are incremental updates
so a mid-run kill still leaves a parseable result). Baseline target
(BASELINE.md): >= 2000 FPS/chip on TPU v5e, so vs_baseline = fps / 2000.

Outage hardening (VERDICT r3 weak #1): the tunneled TPU backend drops for
30+ minutes at a time, and round 3's driver run burned its entire budget
probing a dead tunnel (BENCH_r03.json rc=124, parsed: null). The contract
now is: a parseable JSON line is emitted within the driver budget NO
MATTER WHAT.
 - Backend probing is capped at ~120s TOTAL (not per-attempt).
 - The actual measurement runs in a supervised SUBPROCESS sharing stdout:
   it prints the headline JSON line after the FIRST measured batch size
   and re-prints it whenever a better batch lands, so a hang/timeout
   mid-measure still leaves the earlier lines flushed.
 - If the child produced nothing (tunnel died before the first
   measurement), the parent prints a value-0 fallback line.
Total self-imposed wall budget: BENCH_BUDGET_S (default 780s).

Measurement method: N_ITER model invocations are chained inside ONE jitted
lax.scan with a data dependency between iterations, and a single scalar is
fetched at the end. This forces strictly sequential on-device execution and
is immune to async-dispatch measurement artifacts (on tunneled PJRT
backends, jax.block_until_ready can return before execution finishes,
inflating naive loop timings by >100x). Two chain lengths are used and the
slope taken, cancelling the fixed ~29 ms tunnel RTT
(utils/profiling.chained_device_time).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_METRIC = "kp2dtiny_N_multitask_fps_per_chip_320x240"


def _headline(fps: float, backend: str = "none") -> str:
    return json.dumps({
        "metric": _METRIC,
        "value": round(fps, 1),
        "unit": "FPS",
        "vs_baseline": round(fps / 2000.0, 4),
        "backend": backend,
    })


def wait_for_backend(max_wait_s: float = 110.0, probe_timeout_s: float = 45.0):
    """Wait (bounded, ~2 min TOTAL) for the tunneled TPU backend.

    The axon tunnel occasionally drops for minutes at a time; a bench
    started during an outage would otherwise block in backend init and
    then die with 'Unable to initialize backend'. Probe in a SUBPROCESS
    (in-process jax caches a failed backend) until jax.devices() answers
    or the budget runs out, then proceed either way. The budget is total
    across all attempts — round 3 lost its entire driver window to
    6 x ~130s probes."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.time()
        if budget <= 1.0:
            print(f"# backend probe failed {attempt - 1}x; budget "
                  f"({max_wait_s:.0f}s) exhausted; proceeding anyway",
                  file=sys.stderr)
            return False
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                check=True, timeout=min(probe_timeout_s, budget),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            time.sleep(min(10.0, max(0.0, deadline - time.time())))


def measure(marker_path: str | None = None, budget_s: float = 1e9):
    """Run the actual FPS measurement, printing an incremental headline
    JSON line after every batch size that improves the best FPS. Touches
    marker_path once the first line is out (the parent's 'child produced
    output' signal)."""
    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.postprocess import post_process
    from nanovs_slam_tpu.utils.profiling import chained_device_time

    t0 = time.time()
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

    n_lo, n_hi = (5, 30) if on_tpu else (1, 3)
    best_fps = 0.0
    # B=128 first: the known-optimal lane-tile batch (docs/KERNELS.md) —
    # the FIRST printed headline should already be the representative one.
    for B in ([128, 64, 256] if on_tpu else [4]):
        if best_fps > 0 and time.time() - t0 > budget_s:
            print(f"# budget reached; skipping B={B}", file=sys.stderr)
            continue
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32)
        dt, rtt = chained_device_time(one, x, n_lo, n_hi)
        fps = B / dt
        print(f"# B={B}: {dt * 1e3:.2f} ms/iter -> {fps:.1f} FPS "
              f"(harness rtt {rtt * 1e3:.1f} ms)", file=sys.stderr)
        if fps > best_fps:
            best_fps = fps
            print(_headline(best_fps, jax.default_backend()), flush=True)
            if marker_path:
                with open(marker_path, "w") as f:
                    f.write("ok")


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "780"))
    t0 = time.time()
    alive = wait_for_backend(max_wait_s=min(110.0, budget_s / 4))

    marker = tempfile.NamedTemporaryFile(prefix="bench_marker_",
                                         suffix=".txt", delete=False)
    marker.close()
    os.unlink(marker.name)

    remaining = max(60.0, budget_s - (time.time() - t0) - 15.0)
    env = dict(os.environ)
    if not alive:
        # dead tunnel: force the child onto CPU so the fallback
        # measurement actually completes — without this the child hangs
        # in axon backend init (sitecustomize registers the plugin) and
        # only the zero line would ever be printed. The headline carries
        # a backend tag so a CPU number can't masquerade as a TPU one.
        print("# backend unreachable; forcing CPU in the measurement "
              "child", file=sys.stderr)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure", marker.name,
         str(remaining - 30.0)],
        start_new_session=True, env=env)
    try:
        rc = child.wait(timeout=remaining)
        if rc != 0:
            print(f"# measurement child exited rc={rc}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"# measurement child exceeded {remaining:.0f}s; killing",
              file=sys.stderr)
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        child.wait()

    if os.path.exists(marker.name):
        os.unlink(marker.name)  # child printed >=1 headline line already
    else:
        # nothing measured (tunnel dead through the whole budget): still
        # honor the parseable-line contract with an explicit zero.
        print("# no measurement completed (backend unavailable); "
              "emitting zero headline", file=sys.stderr)
        print(_headline(0.0), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        measure(sys.argv[2] if len(sys.argv) > 2 else None,
                float(sys.argv[3]) if len(sys.argv) > 3 else 1e9)
    else:
        main()
