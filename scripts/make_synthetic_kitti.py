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


def _texture(rs, h, w, octaves=(4, 16, 64), gray=False):
    """Multi-octave random texture: high-frequency detail so descriptors
    are locally DISTINCTIVE (a smooth low-frequency texture makes
    nearest-neighbour descriptors near-tie, and two numerically
    near-identical stacks then pick disjoint match sets)."""
    import cv2

    acc = np.zeros((h, w, 3), np.float32)
    for i, o in enumerate(octaves):
        layer = cv2.resize(rs.rand(max(2, h // o), max(2, w // o), 3)
                           .astype(np.float32), (w, h),
                           interpolation=cv2.INTER_CUBIC)
        acc += layer / (i + 1)
    acc = (acc - acc.min()) / (np.ptp(acc) + 1e-9)
    img = (acc * 255).astype(np.uint8)
    for _ in range(h * w // 2000):  # sharp corner features at all scales
        x, y = rs.randint(0, w - 4), rs.randint(0, h - 4)
        s = rs.randint(3, 18)
        c = tuple(int(v) for v in rs.randint(0, 255, 3))
        cv2.rectangle(img, (x, y), (min(x + s, w - 1), min(y + s, h - 1)),
                      c, -1)
    if gray:
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        img = np.repeat(g[..., None], 3, axis=-1)
    return img


def make_corridor_sequence(out_dir: str, n_frames: int = 30,
                           W_img: int = 1241, H_img: int = 376,
                           step: float = 0.4, yaw_rate: float = 0.006,
                           seed: int = 0, gray: bool = True):
    """Non-degenerate VO fixture: a textured CORRIDOR (ground plane +
    two side walls + far wall) with FORWARD camera motion and gentle yaw.

    The lateral-shift fixture (make_sequence) is a single fronto-parallel
    plane under translation — uniform optical flow, the classic
    degenerate configuration for essential-matrix estimation (planar
    scene: E is ambiguous up to the twisted pair; any two near-identical
    pipelines can recover different, equally-epipolar-consistent poses).
    Here scene points span ~2-60 m of depth, so parallax pins the pose
    and pipeline-parity comparisons (tools/pipeline_parity.py --task vo)
    are meaningful.

    Each plane is EXACT geometry: world plane (u,v)->3D is affine, so
    plane->image is the 3x3 homography [K R^T U | K R^T V | K R^T (O-p)];
    frames are cv2.warpPerspective renders composited far-to-near.
    Camera convention: x right, y down, z forward; poses written
    camera-to-world in KITTI odometry format (12 floats, [R|t])."""
    import cv2

    fx, fy, cx, cy = 718.856, 718.856, 607.1928, 185.2157
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    rs = np.random.RandomState(seed)

    h_cam = 1.65        # camera height above ground (KITTI-like)
    half_w = 7.0        # corridor half-width
    z_far = 80.0        # far-wall distance (world)
    wall_top = -6.0     # walls extend 6 m above camera height

    ppm = 36  # texture pixels per metre
    # plane = (origin O, U axis, V axis, extent_u, extent_v, texture)
    planes = []

    def add_plane(O, U, V, eu, ev):
        tex = _texture(rs, int(ev * ppm), int(eu * ppm), gray=gray)
        planes.append((np.asarray(O, float), np.asarray(U, float),
                       np.asarray(V, float), eu, ev, tex))

    z_len = z_far + step * n_frames + 10
    # far wall (rendered first: most distant)
    add_plane([-half_w, wall_top, z_far], [1, 0, 0], [0, 1, 0],
              2 * half_w, h_cam - wall_top)
    # left wall x=-half_w: u along +z, v along +y (down)
    add_plane([-half_w, wall_top, 0], [0, 0, 1], [0, 1, 0],
              z_len, h_cam - wall_top)
    # right wall x=+half_w
    add_plane([half_w, wall_top, 0], [0, 0, 1], [0, 1, 0],
              z_len, h_cam - wall_top)
    # ground y=+h_cam: u along +x, v along +z
    add_plane([-half_w, h_cam, 0], [1, 0, 0], [0, 0, 1],
              2 * half_w, z_len)

    def render(R, p):
        frame = np.zeros((H_img, W_img, 3), np.uint8)
        Rt = R.T
        # Behind-camera culling: warpPerspective inverse-maps every DEST
        # pixel through H^-1 sign-blind, so plane points BEHIND the camera
        # with in-extent texture coords render mirrored into the frame
        # (measured: 22% of frame-25 pixels were mirrored wrong-wall /
        # ground-on-sky texture before this crop — geometrically false
        # correspondences in a VO/parity fixture). Fix: per frame, crop
        # each z-extended plane (walls: U=+z; ground: V=+z) to
        # z >= cam_z + 3 m. The culled band is invisible anyway: a wall
        # point at lateral |x|=7 enters the horizontal FOV
        # (atan(cx/fx)=40.8 deg) only at depth > 8.1 m, the ground
        # (1.65 m below, vertical FOV 14.6 deg) only at depth > 6.3 m,
        # and |yaw| stays < 0.02 rad so the 3 m margin dominates the
        # lateral depth term.
        crop_px = int(max(0.0, p[2] + 3.0) * ppm)
        for O, U, V, eu, ev, tex in planes:
            if U[2] == 1.0 and crop_px > 0:       # side wall: u is +z
                n = min(crop_px, tex.shape[1] - ppm)
                O = O + U * (n / ppm)
                tex, eu = tex[:, n:], eu - n / ppm
            elif V[2] == 1.0 and crop_px > 0:     # ground: v is +z
                n = min(crop_px, tex.shape[0] - ppm)
                O = O + V * (n / ppm)
                tex, ev = tex[n:, :], ev - n / ppm
            th, tw = tex.shape[:2]
            # homography plane-(u,v)-in-texture-pixels -> image
            cols = np.stack([Rt @ U * (eu / tw), Rt @ V * (ev / th),
                             Rt @ (O - p)], axis=1)
            H = K @ cols
            mask = np.full((th, tw), 255, np.uint8)
            wf = cv2.warpPerspective(tex, H, (W_img, H_img),
                                     flags=cv2.INTER_LINEAR)
            wm = cv2.warpPerspective(mask, H, (W_img, H_img),
                                     flags=cv2.INTER_NEAREST)
            frame[wm > 0] = wf[wm > 0]
        return frame

    # trajectory: forward with gentle sinusoidal yaw
    poses = []
    p = np.zeros(3)
    yaw = 0.0
    for i in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])  # yaw about y
        poses.append((R.copy(), p.copy()))
        p = p + R @ np.array([0, 0, step])
        yaw += yaw_rate * np.sin(2 * np.pi * i / max(n_frames - 1, 1))

    os.makedirs(out_dir, exist_ok=True)
    vw = cv2.VideoWriter(f"{out_dir}/06.mp4",
                         cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (W_img, H_img))
    lines = []
    for R, pos in poses:
        vw.write(render(R, pos))
        P = np.hstack([R, pos.reshape(3, 1)])
        lines.append(" ".join(f"{v:.6e}" for v in P.reshape(-1)))
    vw.release()
    with open(f"{out_dir}/06.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return step


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if len(sys.argv) > 3 and sys.argv[3] == "corridor":
        t_step = make_corridor_sequence(out, n)
        print(f"corridor kitti at {out}: {n} frames, step {t_step:.2f} m")
    else:
        t_step = make_sequence(out, n)
        print(f"synthetic kitti at {out}: {n} frames, t_step {t_step:.4f} m")
