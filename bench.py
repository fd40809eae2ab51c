"""Benchmark: KP2Dtiny-N multitask inference FPS/chip at 320x240.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the LAST
such line on stdout is the headline. Baseline target (BASELINE.md):
>= 2000 FPS/chip on TPU v5e, so vs_baseline = fps / 2000.

Un-zeroable contract (VERDICT r4 weak #1 / next #1). Two consecutive
driver rounds recorded no FPS (r3: rc=124 probing a dead tunnel; r4: the
TPU child hung mid-measurement after a PASSING probe and the parent
degraded straight to a value-0 line) while the same chip measurably ran
this program at 10k+ FPS the same morning. The bench now banks a number
BEFORE touching the tunnel:

 1. Phase CPU (always first): a forced-CPU child (JAX_PLATFORMS=cpu,
    PALLAS_AXON_POOL_IPS="") measures and prints a cpu-tagged headline.
    This is the proven ~3 min path; after it completes the headline can
    no longer be zero regardless of tunnel state.
 2. Phase TPU (only if a bounded probe says the backend answers): a
    second child measures on the chip, printing a tpu-tagged headline
    after its FIRST batch and re-printing on improvement. The child
    heartbeats a file at every stage boundary; the parent kills it if
    the heartbeat goes stale (default 240 s) — a mid-measure tunnel
    hang costs at most the staleness window, not the whole budget.
 3. Final: the parent re-prints the BEST recorded headline so the last
    stdout line is always the best measurement (tpu beats cpu when both
    exist because the value is ~40x higher).

Each child appends every improved headline to a result file; the parent
never parses child stdout. Total wall budget: BENCH_BUDGET_S (default
780 s).

Measurement method: N_ITER model invocations are chained inside ONE
jitted lax.scan with a data dependency between iterations, and a single
scalar is fetched at the end. Two chain lengths are timed and the slope
taken, cancelling the fixed ~29 ms tunnel RTT
(utils/profiling.chained_device_time) — on tunneled PJRT backends
jax.block_until_ready can return before execution finishes, so naive
loop timings are wrong in both directions.
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


def wait_for_backend(max_wait_s: float = 110.0,
                     probe_timeout_s: float = 45.0) -> bool:
    """Back-compat alias used by bench_latency.py / tools: bounded wait
    for a live TPU backend (returns False if only CPU would answer)."""
    return _probe_backend(max_wait_s, probe_timeout_s)


def _probe_backend(total_budget_s: float = 90.0,
                   probe_timeout_s: float = 45.0) -> bool:
    """Ask (in a subprocess — in-process jax caches a failed backend)
    whether jax.devices() answers. Bounded TOTAL: round 3 lost its whole
    driver window to 6 x ~130 s probes."""
    deadline = time.time() + total_budget_s
    while time.time() < deadline - 1.0:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.default_backend() == 'tpu'"],
                check=True,
                timeout=min(probe_timeout_s, deadline - time.time()),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            time.sleep(min(8.0, max(0.0, deadline - time.time())))
    return False


def measure(result_path: str, heartbeat_path: str, budget_s: float):
    """Child: run the FPS measurement. Prints an incremental headline
    after every batch size that improves the best FPS, appends the same
    line to result_path, and touches heartbeat_path at every stage
    boundary so the parent can tell a slow compile from a dead tunnel."""
    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.postprocess import post_process
    from nanovs_slam_tpu.utils.profiling import chained_device_time

    def beat():
        with open(heartbeat_path, "w") as f:
            f.write(str(time.time()))

    t0 = time.time()
    beat()
    H, W = 240, 320
    on_tpu = jax.default_backend() == "tpu"
    beat()  # backend initialized — the first real tunnel round-trip
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    def one(x):
        out = model.apply(variables, x, False)
        if on_tpu:
            # fused Pallas postprocess kernel (1.65x end-to-end vs the
            # XLA gather path; golden-tested identical outputs)
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
        # reduce every output to a scalar so nothing is DCE'd
        return (post["score"].astype(jnp.float32).sum()
                + post["feat"].astype(jnp.float32).sum()
                + post["coord"].astype(jnp.float32).sum()
                + post["seg"].astype(jnp.float32).sum()
                + post["vlad"].astype(jnp.float32).sum())

    best_fps = 0.0

    def record(fps: float, tag: str = ""):
        nonlocal best_fps
        if fps > best_fps:
            best_fps = fps
            line = _headline(best_fps, jax.default_backend() + tag)
            print(line, flush=True)
            with open(result_path, "a") as f:
                f.write(line + "\n")

    # Plan: bank a quick short-chain number on the FIRST batch size,
    # then refine with the full (5,30) chains and the other sizes.
    # B=128 first: the known-optimal lane-tile batch (docs/KERNELS.md).
    if on_tpu:
        plan = [(128, 3, 10, 2), (128, 5, 30, 3), (256, 5, 30, 3),
                (64, 5, 30, 3)]
    else:
        plan = [(4, 1, 3, 2)]
    for B, n_lo, n_hi, repeats in plan:
        if best_fps > 0 and time.time() - t0 > budget_s:
            print(f"# budget reached; skipping B={B} ({n_lo},{n_hi})",
                  file=sys.stderr)
            continue
        beat()
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                              jnp.float32)
        dt, rtt = chained_device_time(one, x, n_lo, n_hi,
                                      repeats=repeats)
        beat()
        fps = B / dt
        print(f"# B={B} chains=({n_lo},{n_hi}): {dt * 1e3:.2f} ms/iter "
              f"-> {fps:.1f} FPS (rtt {rtt * 1e3:.1f} ms)",
              file=sys.stderr)
        record(fps)

    # Final optional stage: calibrated int8 execution (real int8xint8->
    # int32 MXU convs, quant.int8_execution — the deployment config the
    # reference ships as PTQ). Parity is pinned by
    # tests/test_int8_execution.py; measured ~1.05x bf16 at B=128
    # (artifacts/int8_fps_probe.json). Only attempted once a bf16
    # number is banked and budget remains.
    if on_tpu and best_fps > 0 and time.time() - t0 < budget_s:
        try:
            import numpy as np

            from nanovs_slam_tpu import quant

            beat()
            rs = np.random.RandomState(0)
            calib = jnp.asarray(rs.rand(4, H, W, 3).astype(np.float32))
            scales = quant.calibrate_conv_scales(
                lambda v, b, mutable: model.apply(v, b, False,
                                                  mutable=mutable),
                variables, [calib], max_batches=1)

            def one_int8(x):
                with quant.int8_execution(scales):
                    return one(x)

            B = 128
            x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                                  jnp.float32)
            beat()
            dt, rtt = chained_device_time(one_int8, x, 5, 30, repeats=3)
            beat()
            fps = B / dt
            print(f"# int8 B={B}: {dt * 1e3:.2f} ms/iter -> {fps:.1f} "
                  f"FPS (rtt {rtt * 1e3:.1f} ms)", file=sys.stderr)
            record(fps, tag="-int8")
        except Exception as e:  # int8 is a bonus stage, never fatal
            print(f"# int8 stage skipped: {e}", file=sys.stderr)


def _run_child(env: dict, result_path: str, heartbeat_path: str,
               child_budget_s: float, wall_cap_s: float,
               stale_s: float, tag: str) -> None:
    """Run one measurement child, killing it if its heartbeat goes
    stale or the wall cap is exceeded."""
    open(heartbeat_path, "w").write(str(time.time()))
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure",
         result_path, heartbeat_path, str(child_budget_s)],
        start_new_session=True, env=env)
    deadline = time.time() + wall_cap_s
    while True:
        rc = child.poll()
        if rc is not None:
            if rc != 0:
                print(f"# {tag} child exited rc={rc}", file=sys.stderr)
            return
        try:
            stale = time.time() - os.path.getmtime(heartbeat_path)
        except OSError:
            stale = 0.0
        if time.time() > deadline or stale > stale_s:
            why = ("wall cap" if time.time() > deadline
                   else f"heartbeat stale {stale:.0f}s")
            print(f"# killing {tag} child ({why})", file=sys.stderr)
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            child.wait()
            return
        time.sleep(2.0)


def _best_recorded(paths) -> str | None:
    best, best_v = None, -1.0
    for p in paths:
        try:
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    if d.get("value", 0.0) > best_v:
                        best, best_v = line, d["value"]
        except (OSError, ValueError):
            continue
    return best


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "780"))
    stale_s = float(os.environ.get("BENCH_STALE_S", "240"))
    t0 = time.time()
    tmpdir = tempfile.mkdtemp(prefix="bench_")
    cpu_res = os.path.join(tmpdir, "cpu.jsonl")
    tpu_res = os.path.join(tmpdir, "tpu.jsonl")
    hb = os.path.join(tmpdir, "heartbeat")

    # Phase CPU: bank a nonzero headline before touching the tunnel.
    cpu_cap = min(330.0, budget_s * 0.45)
    cpu_env = dict(os.environ)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    cpu_env["PALLAS_AXON_POOL_IPS"] = ""
    print(f"# phase cpu: banking a forced-CPU headline "
          f"(cap {cpu_cap:.0f}s)", file=sys.stderr)
    _run_child(cpu_env, cpu_res, hb, cpu_cap - 20.0, cpu_cap,
               stale_s, "cpu")

    # Phase TPU: only if the backend answers a bounded probe.
    remaining = budget_s - (time.time() - t0)
    if remaining > 150.0:
        probe_budget = min(90.0, remaining * 0.2)
        if _probe_backend(probe_budget):
            remaining = budget_s - (time.time() - t0) - 15.0
            print(f"# phase tpu: backend alive, measuring "
                  f"(cap {remaining:.0f}s, heartbeat stale limit "
                  f"{stale_s:.0f}s)", file=sys.stderr)
            _run_child(dict(os.environ), tpu_res, hb,
                       remaining - 30.0, remaining, stale_s, "tpu")
        else:
            print("# phase tpu: backend unreachable within probe "
                  "budget; keeping the banked CPU headline",
                  file=sys.stderr)
    else:
        print("# phase tpu: skipped (insufficient remaining budget)",
              file=sys.stderr)

    # Final: the LAST stdout line must be the best measurement.
    best = _best_recorded([tpu_res, cpu_res])
    if best is not None:
        print(best, flush=True)
    else:
        # Nothing measured anywhere (would need CPU AND tunnel both
        # broken): still honor the parseable-line contract.
        print("# no measurement completed on any backend; emitting "
              "zero headline", file=sys.stderr)
        print(_headline(0.0), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        measure(sys.argv[2], sys.argv[3], float(sys.argv[4]))
    else:
        main()
