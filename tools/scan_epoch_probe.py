"""Probe: whole-epoch lax.scan (train/scan_epoch.py) vs the
step-at-a-time loop, measured end-to-end on the live chip.

The loop path dispatches 2 programs per step (batch assembly + train
step) and uploads the step's (B,) indices + (B,3,3) homographies each
time; the scan path dispatches ONE program per epoch and uploads the
whole epoch's (S,B) + (S,B,3,3) once. On a tunneled/remote TPU each
dispatch pays a host->device round trip, so the scan's win should be
~2*S RTTs per epoch; locally it is bounded by per-launch overhead.

Timing: the tunneled backend's block_until_ready can return early
(docs/KERNELS.md), so each epoch is forced by fetching the LAST step's
total_loss scalar — a value data-dependent on every previous step
through the carried train state, which syncs the full chain with a
4-byte transfer. Host-side epoch randomness (sample_homography draws)
is INCLUDED in both paths — it is real production cost and identical
work for both (same RandomState stream; tests/test_scan_epoch.py pins
input equality).

Usage: python tools/scan_epoch_probe.py [--reps 3] [--items 512]
       [--batch 16] [--h 96] [--w 128]
Writes artifacts/scan_epoch_probe.json.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--items", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--w", type=int, default=128)
    args = ap.parse_args()

    import jax
    import numpy as np

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
    from nanovs_slam_tpu.data.device_cache import DeviceCachedPairLoader
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.train.multitask_loss import default_loss_weights
    from nanovs_slam_tpu.train.scan_epoch import (make_epoch_fn,
                                                  weights_as_arrays)
    from nanovs_slam_tpu.train.train_step import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    H, W = args.h, args.w
    cfg = get_config("N", n_classes=8,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)

    ds = SyntheticShapesDataset((H, W), n_items=args.items, n_classes=8)
    loader = DeviceCachedPairLoader(ds, args.batch, H, W, d_f=2,
                                    train=True, seed=0)
    S = len(loader)
    weights = default_loss_weights()
    rng = jax.random.PRNGKey(0)

    def fresh_state():
        tx = make_optimizer("adam", lr=3e-4)
        state, io_net = create_train_state(
            model, cfg, jax.random.PRNGKey(0), (1, H, W, 3), tx,
            with_io=True)
        return state, io_net

    out = {"backend": backend, "steps_per_epoch": S,
           "batch": args.batch, "hw": [H, W], "reps": args.reps,
           "store_u8": bool(loader.store_u8)}
    path = os.path.join(_REPO, "artifacts",
                        f"scan_epoch_probe_{H}x{W}_b{args.batch}.json")

    def save():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- loop path: 2 dispatches/step --------------------------------
    state, io_net = fresh_state()
    step_fn = make_train_step(model, cfg, H, W, io_net=io_net)

    def run_loop_epoch(state, e):
        epoch_rng = jax.random.fold_in(rng, e)
        for i, batch in enumerate(loader.epoch(e)):
            state, metrics = step_fn(state, batch, weights,
                                     jax.random.fold_in(epoch_rng, i))
        return state, float(np.asarray(metrics["total_loss"]))

    t0 = time.time()
    state, _ = run_loop_epoch(state, 0)  # warm/compile
    out["loop_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for e in range(1, 1 + args.reps):
        state, last_loss = run_loop_epoch(state, e)
    loop_ms = (time.time() - t0) / args.reps * 1e3
    out["loop_epoch_ms"] = round(loop_ms, 1)
    out["loop_steps_per_s"] = round(S / (loop_ms / 1e3), 1)
    out["loop_last_loss"] = last_loss
    print(f"loop:  {loop_ms:.1f} ms/epoch "
          f"({out['loop_steps_per_s']} steps/s)", flush=True)
    save()

    # ---- scan path: 1 dispatch/epoch ---------------------------------
    state, io_net = fresh_state()
    step_body = make_train_step(model, cfg, H, W, io_net=io_net,
                                jit_compile=False)
    epoch_fn = make_epoch_fn(step_body, d_f=2, with_depth=False,
                             augment=True)
    cache = loader.cache_arrays()

    def run_scan_epoch(state, e):
        idx_all, homos_all, assemble_rng = loader.epoch_arrays(e)
        state, metrics_stack = epoch_fn(state, cache, idx_all, homos_all,
                                        weights_as_arrays(weights),
                                        assemble_rng,
                                        jax.random.fold_in(rng, e))
        return state, float(np.asarray(metrics_stack["total_loss"][-1]))

    t0 = time.time()
    state, _ = run_scan_epoch(state, 0)  # warm/compile
    out["scan_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for e in range(1, 1 + args.reps):
        state, last_loss = run_scan_epoch(state, e)
    scan_ms = (time.time() - t0) / args.reps * 1e3
    out["scan_epoch_ms"] = round(scan_ms, 1)
    out["scan_steps_per_s"] = round(S / (scan_ms / 1e3), 1)
    out["scan_last_loss"] = last_loss
    out["speedup"] = round(loop_ms / scan_ms, 2)
    print(f"scan:  {scan_ms:.1f} ms/epoch "
          f"({out['scan_steps_per_s']} steps/s)  "
          f"speedup {out['speedup']}x", flush=True)

    # host-side epoch randomness alone (shared by both paths)
    t0 = time.time()
    for e in range(1, 1 + args.reps):
        loader.epoch_arrays(e)
    out["host_rand_ms"] = round((time.time() - t0) / args.reps * 1e3, 1)
    print(json.dumps(out, indent=1), flush=True)
    save()


if __name__ == "__main__":
    main()
