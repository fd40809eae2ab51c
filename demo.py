#!/usr/bin/env python
"""Demo: run KP2Dtiny keypoint+descriptor+seg inference on images.

Reference surface: demo.py (keypoint visualization on demo images with a
VO frontend). Accepts a folder of images or a video; draws top-k
keypoints and the segmentation overlay; optionally saves to disk.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="image file, folder of images, or video")
    p.add_argument("--model_path", default=None,
                   help="checkpoint dir (orbax) or reference .ckpt")
    p.add_argument("--config", default="N")
    p.add_argument("--model_type", default="KP2DtinyV2")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--im_h", type=int, default=240)
    p.add_argument("--im_w", type=int, default=320)
    p.add_argument("--top_k", type=int, default=1000)
    p.add_argument("--conf", type=float, default=0.7)
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--video_out", default=None,
                   help="write an mp4 of keypoint+seg overlays instead of "
                        "PNGs (reference demo writes mp4s)")
    p.add_argument("--max_frames", type=int, default=50)
    p.add_argument("--tracks", action="store_true",
                   help="overlay frame-to-frame match tracks (reference "
                        "drawFeatureTracks) instead of bare keypoints")
    return p.parse_args()


def main():
    import cv2

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend

    args = parse_args()
    H, W = args.im_h, args.im_w
    v3 = args.model_type in ("KP2DtinyV3", "DF")
    cfg = get_config(args.config, v3=v3, n_classes=args.n_classes)
    model = build_model(cfg)
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

    fe = KP2DTinyFrontend(model, cfg,
                          {"params": params, "batch_stats": batch_stats},
                          (H, W), nn_thresh=args.conf, top_k=args.top_k,
                          with_seg=True)

    if os.path.isdir(args.input):
        frames = sorted(glob.glob(os.path.join(args.input, "*")))
        reader = (cv2.imread(f) for f in frames)
    elif args.input.endswith((".mp4", ".avi")):
        cap = cv2.VideoCapture(args.input)

        def video_iter():
            while True:
                ret, f = cap.read()
                if not ret:
                    break
                yield f
        reader = video_iter()
    else:
        reader = iter([cv2.imread(args.input)])

    vo = None
    if args.tracks:
        from nanovs_slam_tpu.vo.camera import PinholeCamera
        from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

        # focal guess ~ W is fine for visualization-only tracks
        vo = VisualOdometry(fe, PinholeCamera(W, H, W, W, W / 2, H / 2))

    os.makedirs(args.out_dir, exist_ok=True)
    writer = None
    for i, frame in enumerate(reader):
        if frame is None or i >= args.max_frames:
            break
        rgb = cv2.cvtColor(cv2.resize(frame, (W, H)), cv2.COLOR_BGR2RGB)
        vis = cv2.resize(frame, (W, H))
        if vo is not None:
            if i == 0:
                vo.init(rgb.astype(np.float32) / 255.0)
                pts = vo.kps_prev
            else:
                vo.process_image(rgb.astype(np.float32) / 255.0)
                pts = vo.kps_prev
                vis = vo.draw_feature_tracks(vis)
            out = {"seg": np.zeros((1, H, W, 1), np.uint8)}
        else:
            pts, desc, out = fe.run(rgb.astype(np.float32) / 255.0)
            for x, y in pts.astype(int):
                cv2.circle(vis, (x, y), 2, (0, 0, 255), -1)
        seg = np.asarray(out["seg"])[0, :, :, 0].astype(np.uint8)
        seg_vis = cv2.applyColorMap(
            (seg * (255 // max(args.n_classes - 1, 1))).astype(np.uint8),
            cv2.COLORMAP_JET)
        seg_vis = cv2.resize(seg_vis, (W, H),
                             interpolation=cv2.INTER_NEAREST)
        combined = np.vstack([vis, seg_vis])
        if args.video_out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.video_out, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                    (combined.shape[1], combined.shape[0]))
            writer.write(combined)
            print(f"frame {i}: {len(pts)} keypoints")
        else:
            out_path = os.path.join(args.out_dir, f"frame_{i:04d}.png")
            cv2.imwrite(out_path, combined)
            print(f"{out_path}: {len(pts)} keypoints")
    if writer is not None:
        writer.release()
        print(f"video written to {args.video_out}")
    print("done")


if __name__ == "__main__":
    main()
