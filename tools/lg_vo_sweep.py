#!/usr/bin/env python
"""Root-cause sweep for the in-pipeline LightGlue regression (VERDICT r4
next #2): the trained matcher wins the held-out homography benchmark at
its TRAINING distribution (120x160, K=256) but loses to BF inside the
corridor VO pipeline (128x512, k=512, filter_threshold 0.1, keypoints
normalized by the full 1241x376 camera frame).

This sweep isolates the mismatch axes one at a time on the offline
corridor protocol: per-frame keypoint budget k (training used 256),
match filter threshold (training filtered at 0.0), and keypoint
normalization frame (camera vs resized image — the reference normalizes
by the frame the keypoints live in, visual_odometry.py:119-121+231).
Writes artifacts/lg_vo_sweep.json.
"""

import itertools
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main():
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
    from nanovs_slam_tpu.vo.offline import evaluate_visual_odometry_offline
    from nanovs_slam_tpu.vo.visual_odometry import load_lightglue_for_vo

    kitti = os.path.join(_REPO, "fixtures", "kitti_corridor_gray")
    H, W, frames = 128, 512, 30
    cfg = get_config("S", n_classes=8)
    model = build_model(cfg)
    tree, _ = load_checkpoint(os.path.join(_REPO, "model_ckpt", "r5_long"))
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    lg_ckpt = os.path.join(_REPO, "model_ckpt", "lg_r5")

    out = {}
    for k, thr in itertools.product((256, 512), (0.0, 0.1, 0.2)):
        model_lg, params_lg, _size, _n = load_lightglue_for_vo(
            lg_ckpt, cfg.nfeatures, (1241, 376), threshold=thr)
        r = evaluate_visual_odometry_offline(
            model, cfg, variables, kitti, "06.txt", "06.mp4", (H, W),
            max_frames=frames, verbose=True, matcher="lightglue",
            lightglue=(model_lg, params_lg), k=k)
        row = {"total_mean": r["total"]["mean"],
               "n_matches_mean": r["stats"]["n_matches"]["mean"],
               "n_inliers_mean": r["stats"].get("n_inliers", {}).get(
                   "mean")}
        out[f"k{k}_thr{thr}"] = row
        print(f"k={k} thr={thr}: {json.dumps(row)}", flush=True)

    # BF baseline at both budgets for context
    for k in (256, 512):
        r = evaluate_visual_odometry_offline(
            model, cfg, variables, kitti, "06.txt", "06.mp4", (H, W),
            max_frames=frames, verbose=True, matcher="bf", k=k)
        out[f"bf_k{k}"] = {"total_mean": r["total"]["mean"],
                           "n_matches_mean": r["stats"]["n_matches"]["mean"]}
        print(f"bf k={k}: {json.dumps(out[f'bf_k{k}'])}", flush=True)

    path = os.path.join(_REPO, "artifacts", "lg_vo_sweep.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
