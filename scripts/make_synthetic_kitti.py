#!/usr/bin/env python
"""Generate a synthetic KITTI-format VO sequence (video + poses file).

A camera translates laterally over a textured fronto-parallel plane at
depth Z, so each frame is an exact pixel shift of a rich texture: the VO
pipeline (vo_eval.py --kitti_path <out>) must recover a straight
trajectory. Pose file uses the KITTI odometry convention (12 floats per
line, row-major 3x4 [R|t]).

Usage: python scripts/make_synthetic_kitti.py [out_dir] [n_frames]
"""

import os
import sys

import numpy as np


def make_sequence(out_dir: str, n_frames: int = 12, W_img: int = 1241,
                  H_img: int = 376, step_px: float = 40.0, Z: float = 20.0,
                  seed: int = 0, gray: bool = False):
    """gray=True writes R=G=B frames: the reference VO feeds raw
    cv2-BGR frames to the net (evaluation/visual_odometry.py:248,77 — no
    BGR->RGB conversion) while this framework feeds RGB; a gray texture
    makes the two pipelines' inputs identical for parity runs."""
    import cv2

    fx = 718.856  # KITTI intrinsics (vo/camera.py kitti_params)
    rs = np.random.RandomState(seed)
    # rich colored texture with many rectangle corners
    pad = int(step_px * n_frames) + 8
    big = (np.clip(cv2.resize(rs.rand(80, 200, 3), (W_img + pad, H_img + 20),
                              interpolation=cv2.INTER_CUBIC) * 0.8 + 0.1,
                   0, 1) * 255).astype(np.uint8)
    for _ in range(300):
        x = rs.randint(0, W_img + pad - 50)
        y = rs.randint(0, H_img - 10)
        c = tuple(int(v) for v in rs.randint(0, 255, 3))
        cv2.rectangle(big, (x, y), (x + rs.randint(4, 30),
                                    y + rs.randint(4, 30)), c, -1)
    if gray:
        g = cv2.cvtColor(big, cv2.COLOR_BGR2GRAY)
        big = np.repeat(g[..., None], 3, axis=-1)

    t_step = step_px * Z / fx  # metres per frame for the GT scale
    os.makedirs(out_dir, exist_ok=True)
    vw = cv2.VideoWriter(f"{out_dir}/06.mp4",
                         cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (W_img, H_img))
    lines = []
    for i in range(n_frames):
        off = int(round(i * step_px))
        vw.write(big[10:10 + H_img, off:off + W_img])
        # camera moves +x by t_step per frame, identity rotation
        P = np.hstack([np.eye(3), np.array([[i * t_step], [0.0], [0.0]])])
        lines.append(" ".join(f"{v:.6e}" for v in P.reshape(-1)))
    vw.release()
    with open(f"{out_dir}/06.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return t_step


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    t_step = make_sequence(out, n)
    print(f"synthetic kitti at {out}: {n} frames, t_step {t_step:.4f} m")
