"""Probe: offline-VO pair batching (lax.map batch_size) on the live chip.

The offline pose map dispatches the device RANSAC once per pair
(23.7 ms/pair at H=8192 restarts=3 on a v5e) — sequential per-pair
programs. pair_batch vmaps the solver over chunks of B pairs inside the
same lax.map; if the per-pair program underutilizes the chip, B pairs
should cost < B x the single-pair time.

Usage: python tools/offline_batch_probe.py [--batches 1 2 4 8]
Writes artifacts/offline_batch_probe.json.
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
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--restarts", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    import jax.numpy as jnp
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.camera import PinholeCamera
    from nanovs_slam_tpu.vo.offline import OfflineVO

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    cfg = get_config("N", n_classes=28,
                     dtype="bfloat16" if on_tpu else "float32")
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, 128, 512, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    T, Hv, Wv = args.frames, 128, 512
    rs = np.random.RandomState(0)
    frames = rs.rand(T, Hv, Wv, 3).astype(np.float32)
    cam = PinholeCamera(Wv, Hv, 350.0, 350.0, Wv / 2, Hv / 2)

    out = {"backend": backend, "frames": T, "restarts": args.restarts,
           "rows": []}
    ref_R = None
    for B in args.batches:
        ovo = OfflineVO(model, cfg, variables, (Hv, Wv), cam,
                        restarts=args.restarts, pair_batch=B)
        t0 = time.time()
        R, t, ninl, nmat = ovo.relative_poses(frames)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            ovo.relative_poses(frames)
        wall = (time.time() - t0) / args.reps
        fps = T / wall
        # pose map alone (device-timed via wall over the warm jitted fn)
        fmaps = ovo.extract(frames)
        kpn0, kpn1, valid = jax.block_until_ready(ovo._match_map(fmaps))
        key = jax.random.PRNGKey(0)
        jax.block_until_ready(ovo._pose_map(kpn0, kpn1, valid, key))
        t0 = time.time()
        for _ in range(args.reps):
            jax.block_until_ready(ovo._pose_map(kpn0, kpn1, valid, key))
        pose_s = (time.time() - t0) / args.reps
        t0 = time.time()
        for _ in range(args.reps):
            jax.block_until_ready(ovo._match_map(fmaps))
        match_s = (time.time() - t0) / args.reps
        if ref_R is None:
            ref_R = R
            max_dR = 0.0
        else:
            max_dR = float(np.abs(R - ref_R).max())
        row = {"pair_batch": B, "sequence_fps": round(fps, 1),
               "wall_ms": round(wall * 1e3, 1),
               "pose_map_ms": round(pose_s * 1e3, 1),
               "pose_ms_per_pair": round(pose_s * 1e3 / (T - 1), 2),
               "match_map_ms": round(match_s * 1e3, 1),
               "compile_s": round(compile_s, 1),
               "max_abs_dR_vs_B1": max_dR}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        path = os.path.join(_REPO, "artifacts", "offline_batch_probe.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
