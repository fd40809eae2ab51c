#!/usr/bin/env python
"""Standalone VO trajectory evaluation on KITTI.

CLI contract mirrors the reference vo_eval.py: run the full VO pipeline
over a KITTI sequence, report absolute/relative error statistics and save
an artifacts JSON (vo_eval.py:95-167 ErrorStatistics, :335-351 artifacts).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--kitti_path", required=True)
    p.add_argument("--gt_name", default="06.txt")
    p.add_argument("--video_name", default="06.mp4")
    p.add_argument("--model_path", default=None)
    p.add_argument("--config", default="N")
    p.add_argument("--model_type", default="KP2DtinyV2")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--im_h", type=int, default=128)
    p.add_argument("--im_w", type=int, default=512)
    p.add_argument("--top_k", type=int, default=4000)
    p.add_argument("--nn_thresh", type=float, default=0.7,
                   help="keypoint confidence threshold (frontend.py:31)")
    p.add_argument("--matcher", default="bf",
                   choices=["bf", "flann", "crosscheck", "semantic",
                            "lightglue", "dense"])
    p.add_argument("--lg_ckpt", default=None,
                   help="trained LightGlue checkpoint for --matcher "
                        "lightglue (train_lightglue.py output)")
    p.add_argument("--lg_threshold", type=float, default=0.0,
                   help="LightGlue match filter threshold (reference "
                        "inference default 0.0, lightglue.py:430; the "
                        "glue-factory TRAINING yamls use 0.1 for val "
                        "metrics only — 0.1 here was measured to double "
                        "corridor VO error, artifacts/lg_vo_sweep.json)")
    p.add_argument("--lg_width", type=float, default=-1.0,
                   help="LightGlue adaptive width pruning confidence "
                        "(reference width_confidence, e.g. 0.99; <=0 "
                        "disables; static-bucket compaction, "
                        "matching/width_pruning.py)")
    p.add_argument("--offline", action="store_true",
                   help="sequence-level offline VO (vo/offline.py): "
                        "batched extraction + one lax.map program over "
                        "pairs (dense matching + device RANSAC); no "
                        "per-frame host round-trips")
    p.add_argument("--dense_rel_conf", type=float, default=0.1,
                   help="dense matcher: adaptive per-pair confidence "
                        "threshold rel*max(conf); 0 = legacy absolute "
                        "0.05 threshold")
    p.add_argument("--device_pose", action="store_true",
                   help="replace the host cv2 USAC_MSAC pose tail with "
                        "the on-device batched RANSAC "
                        "(pose.ransac_essential_device)")
    p.add_argument("--pose_hypotheses", type=int, default=8192,
                   help="device-RANSAC hypothesis count (--device_pose / "
                        "--offline; the hypothesis-parallel TPU-cheap "
                        "axis, measured-best default)")
    p.add_argument("--pose_restarts", type=int, default=3,
                   help="device-RANSAC best-of-N vmapped restart streams, "
                        "winner by final consensus size")
    p.add_argument("--semantic_filter", action="store_true")
    p.add_argument("--classes_to_filter", type=int, nargs="+", default=[21])
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--out", default="vo_results.json")
    p.add_argument("--plot", action="store_true",
                   help="save the estimated trajectory plot")
    return p.parse_args()


def main():
    args = parse_args()
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
    from nanovs_slam_tpu.vo.visual_odometry import evaluate_visual_odometry

    v3 = args.model_type in ("KP2DtinyV3", "DF")
    cfg = get_config(args.config, v3=v3, n_classes=args.n_classes)
    model = build_model(cfg)
    H, W = args.im_h, args.im_w
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    if args.model_path:
        if os.path.isdir(args.model_path) or \
                args.model_path.endswith(".npz"):
            from nanovs_slam_tpu.utils.checkpoint import load_checkpoint

            tree, _ = load_checkpoint(args.model_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:
            from nanovs_slam_tpu.utils.torch_import import \
                load_torch_checkpoint

            params, batch_stats, _ = load_torch_checkpoint(args.model_path)

    if args.offline:
        from nanovs_slam_tpu.vo.offline import \
            evaluate_visual_odometry_offline

        offline_matchers = ("dense", "bf", "lightglue")
        ignored = []
        if args.matcher not in offline_matchers:
            ignored.append(f"--matcher {args.matcher} (offline VO "
                           f"supports {'/'.join(offline_matchers)}; "
                           "falling back to dense)")
        for flag, default in (("device_pose", False),
                              ("semantic_filter", False),
                              ("lg_width", -1.0)):
            if getattr(args, flag) != default:
                ignored.append(f"--{flag}")
        if args.lg_ckpt and args.matcher != "lightglue":
            ignored.append("--lg_ckpt")
        if ignored:
            print("WARNING: --offline ignores: " + ", ".join(ignored))
        matcher = args.matcher if args.matcher in offline_matchers \
            else "dense"
        lightglue = None
        if matcher == "lightglue":
            import cv2

            from nanovs_slam_tpu.vo.visual_odometry import \
                load_lightglue_for_vo

            cap = cv2.VideoCapture(f"{args.kitti_path}/{args.video_name}")
            fw = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            fh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            cap.release()
            lightglue = load_lightglue_for_vo(
                args.lg_ckpt, cfg.nfeatures, (fw, fh),
                threshold=args.lg_threshold)[:2]
        results = evaluate_visual_odometry_offline(
            model, cfg, {"params": params, "batch_stats": batch_stats},
            args.kitti_path, args.gt_name, args.video_name, (H, W),
            max_frames=args.max_frames, verbose=True,
            matcher=matcher, lightglue=lightglue,
            k=min(args.top_k, 1024) if matcher != "dense" else 512,
            dense_rel_conf=args.dense_rel_conf,
            n_hypotheses=args.pose_hypotheses,
            restarts=args.pose_restarts)
        print(json.dumps(results, indent=2, default=str))
        with open(args.out, "w") as f:
            json.dump({"args": vars(args), "results": results}, f,
                      indent=2, default=str)
        if args.plot:
            from nanovs_slam_tpu.utils.plot import plot_trajectory

            print("trajectory plot written to",
                  plot_trajectory(results.get("trajectory", []),
                                  path=args.out.replace(
                                      ".json", "_traj.png")))
        return

    fe = KP2DTinyFrontend(
        model, cfg, {"params": params, "batch_stats": batch_stats},
        (H, W), nn_thresh=args.nn_thresh, top_k=args.top_k,
        semantic_filter=args.semantic_filter,
        classes_to_filter=args.classes_to_filter,
        with_seg=args.matcher == "semantic")
    dense = None
    if args.matcher == "dense":
        from nanovs_slam_tpu.matching.dense import DenseMatcher

        dense = DenseMatcher(
            model, cfg, {"params": params, "batch_stats": batch_stats},
            (H, W), k=args.top_k)
    results = evaluate_visual_odometry(
        fe, args.kitti_path, args.gt_name, args.video_name,
        new_size=(H, W), max_frames=args.max_frames, verbose=True,
        matcher=args.matcher, dense=dense,
        lightglue=args.lg_ckpt if args.matcher == "lightglue" else None,
        device_pose=args.device_pose, dense_rel_conf=args.dense_rel_conf,
        lg_width=args.lg_width, lg_threshold=args.lg_threshold,
        pose_hypotheses=args.pose_hypotheses,
        pose_restarts=args.pose_restarts)
    print(json.dumps(results, indent=2, default=str))
    with open(args.out, "w") as f:
        json.dump({"args": vars(args), "results": results}, f, indent=2,
                  default=str)
    if args.plot:
        from nanovs_slam_tpu.utils.plot import plot_trajectory

        # re-run integration to collect the trajectory for plotting
        print("trajectory plot written to",
              plot_trajectory(results.get("trajectory", []),
                              path=args.out.replace(".json", "_traj.png")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
