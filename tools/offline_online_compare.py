#!/usr/bin/env python
"""Online-vs-offline VO comparison on the corridor fixture
(VERDICT r3 #4 'Done' criterion): for each matcher the offline
sequence-level program must reproduce the online frame-loop's error.

The two paths share extraction weights, match semantics (exact for BF —
bf_match_device vs the host matcher is equality-tested in
tests/test_offline_vo.py — and the same jitted LightGlue programs), but
differ in pose solver (online: host cv2 USAC_MSAC by default; offline:
ransac_essential_device) and scheduling (frame loop vs one lax.map), so
the comparison is at the error level, not bitwise.

Writes artifacts/offline_online_corridor.json.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main():
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
    from nanovs_slam_tpu.vo.offline import evaluate_visual_odometry_offline
    from nanovs_slam_tpu.vo.visual_odometry import (
        evaluate_visual_odometry, load_lightglue_for_vo)

    ap = argparse.ArgumentParser()
    ap.add_argument("--extractor",
                    default=os.path.join(_REPO, "model_ckpt", "r5_long"))
    ap.add_argument("--lg",
                    default=os.path.join(_REPO, "model_ckpt", "lg_r5"))
    ap.add_argument("--k", type=int, default=512,
                    help="per-frame keypoint budget (both paths)")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "artifacts", "offline_online_corridor.json"))
    args = ap.parse_args()

    kitti = os.path.join(_REPO, "fixtures", "kitti_corridor_gray")
    H, W, frames = 128, 512, 30
    cfg = get_config("S", n_classes=8)
    model = build_model(cfg)
    tree, _ = load_checkpoint(args.extractor)
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    lg_ckpt = args.lg

    out = {}
    for matcher in ("bf", "lightglue", "dense"):
        row = {}
        # offline (k = the frontend budget used online below)
        lightglue = (load_lightglue_for_vo(lg_ckpt, cfg.nfeatures,
                                           (1241, 376))[:2]
                     if matcher == "lightglue" else None)
        r = evaluate_visual_odometry_offline(
            model, cfg, variables, kitti, "06.txt", "06.mp4", (H, W),
            max_frames=frames, verbose=True, matcher=matcher,
            lightglue=lightglue, k=args.k)
        row["offline_total_mean"] = r["total"]["mean"]
        row["offline_matches_mean"] = r["stats"]["n_matches"]["mean"]

        # online frame loop, same extraction budget
        fe = KP2DTinyFrontend(model, cfg, variables, (H, W),
                              nn_thresh=0.7, top_k=args.k)
        dense = None
        if matcher == "dense":
            from nanovs_slam_tpu.matching.dense import DenseMatcher

            dense = DenseMatcher(model, cfg, variables, (H, W), k=args.k)
        r2 = evaluate_visual_odometry(
            fe, kitti, "06.txt", "06.mp4", new_size=(H, W),
            max_frames=frames, verbose=True, matcher=matcher,
            dense=dense,
            lightglue=lg_ckpt if matcher == "lightglue" else None)
        row["online_total_mean"] = r2["total"]["mean"]
        row["online_matches_mean"] = r2["stats"]["n_matches"]["mean"]
        row["delta"] = abs(row["offline_total_mean"]
                           - row["online_total_mean"])
        out[matcher] = row
        print(matcher, json.dumps(row, indent=1))

    path = args.out
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
