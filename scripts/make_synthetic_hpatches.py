#!/usr/bin/env python
"""Generate a DISCRIMINATIVE synthetic HPatches-format fixture
(VERDICT r2 "Next round" #5).

The round-2 transfer eval used 4 small-warp pairs and saturated
(correctness@{1,3,5}=1.0), so regressions were invisible. This generator
produces 8 sequences x 5 pairs = 40 pairs in the reference's HPatches
folder layout (seq/1.ppm..6.ppm + H_1_N text matrices,
/root/reference/src/data/patches_dataset.py:83-139) with:

- STRONG warps: rotation up to +-35deg, scale 0.55-1.5, perspective
  distortion, translation — graded per pair index (2 = mild ... 6 =
  extreme) like real HPatches' increasing difficulty
- texture diversity: 8 procedural families (multi-octave noise, polygon
  mosaics, checker+distortion, blob fields, line/stroke fields,
  voronoi-ish cells, corner grids, mixed) so detectors face varied
  statistics

Deterministic under --seed. Images are generated at 480x640 and stored as
ppm; eval-time resizing exercises scale_homography exactly like real
HPatches.

Usage: python scripts/make_synthetic_hpatches.py OUTDIR [--seed 0]
"""

import argparse
import os

import cv2
import numpy as np

GH, GW = 480, 640  # generated image size


def _noise_octaves(rs, h, w, octaves=(4, 8, 16, 32, 64)):
    acc = np.zeros((h, w), np.float32)
    for i, o in enumerate(octaves):
        n = rs.rand(o, o).astype(np.float32)
        acc += cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC) / (i + 1)
    acc -= acc.min()
    return acc / max(acc.max(), 1e-6)


def _colorize(rs, gray):
    img = np.stack([gray * rs.uniform(0.5, 1.0) + rs.uniform(0, 0.3)
                    for _ in range(3)], axis=-1)
    return np.clip(img, 0, 1)


def tex_noise(rs):
    return _colorize(rs, _noise_octaves(rs, GH, GW))


def tex_polygons(rs):
    img = np.full((GH, GW, 3), rs.rand(3) * 0.4, np.float32)
    for _ in range(60):
        n = rs.randint(3, 7)
        c = rs.rand(2) * [GW, GH]
        pts = (c + rs.randn(n, 2) * rs.uniform(15, 70)).astype(np.int32)
        cv2.fillPoly(img, [pts], rs.rand(3).tolist())
    return img


def tex_checker(rs):
    cell = rs.randint(16, 48)
    ys, xs = np.mgrid[0:GH, 0:GW]
    base = (((ys // cell) + (xs // cell)) % 2).astype(np.float32)
    # distort the grid with a smooth flow so corners aren't axis-aligned
    flow = (_noise_octaves(rs, GH, GW, (4, 8)) - 0.5) * 60
    mapx = (xs + flow).astype(np.float32)
    mapy = (ys + np.roll(flow, GH // 3, 0)).astype(np.float32)
    warped = cv2.remap(base, mapx, mapy, cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_REFLECT)
    return _colorize(rs, warped * 0.8 + 0.1)


def tex_blobs(rs):
    img = np.zeros((GH, GW, 3), np.float32)
    img[:] = rs.rand(3) * 0.25
    for _ in range(140):
        c = (rs.rand(2) * [GW, GH]).astype(int)
        r = rs.randint(4, 40)
        cv2.circle(img, tuple(c), r, rs.rand(3).tolist(), -1)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


def tex_lines(rs):
    img = np.full((GH, GW, 3), rs.rand(3) * 0.3, np.float32)
    for _ in range(120):
        p0 = (rs.rand(2) * [GW, GH]).astype(int)
        ang, ln = rs.uniform(0, np.pi), rs.randint(20, 160)
        p1 = (p0 + ln * np.array([np.cos(ang), np.sin(ang)])).astype(int)
        cv2.line(img, tuple(p0), tuple(p1), rs.rand(3).tolist(),
                 rs.randint(1, 5))
    return img


def tex_cells(rs):
    seeds = rs.rand(70, 2) * [GW, GH]
    colors = rs.rand(70, 3).astype(np.float32)
    ys, xs = np.mgrid[0:GH:2, 0:GW:2]
    pts = np.stack([xs.ravel(), ys.ravel()], -1)[:, None, :]
    d = np.linalg.norm(pts - seeds[None], axis=-1)
    lab = np.argmin(d, axis=1).reshape(ys.shape)
    small = colors[lab]
    return cv2.resize(small.astype(np.float32), (GW, GH),
                      interpolation=cv2.INTER_NEAREST)


def tex_corners(rs):
    img = np.full((GH, GW, 3), rs.rand(3) * 0.2, np.float32)
    step = rs.randint(40, 70)
    for y in range(step // 2, GH, step):
        for x in range(step // 2, GW, step):
            s = rs.randint(6, step // 2)
            ang = rs.uniform(0, 90)
            box = cv2.boxPoints(((x, y), (s * 2, s * 2), ang)).astype(
                np.int32)
            cv2.fillPoly(img, [box], rs.rand(3).tolist())
    return img


def tex_mixed(rs):
    a = tex_noise(rs) * 0.5 + tex_polygons(rs) * 0.5
    return np.clip(a + (tex_lines(rs) - 0.5) * 0.3, 0, 1)


TEXTURES = [tex_noise, tex_polygons, tex_checker, tex_blobs,
            tex_lines, tex_cells, tex_corners, tex_mixed]


def strong_homography(rs, level):
    """Corner-displacement homography of graded strength.

    level in [0,1]: 0 = mild (rot ~8deg, scale ~0.95), 1 = extreme
    (rot up to 35deg, scale 0.55-1.5, heavy perspective)."""
    ang = np.deg2rad(rs.uniform(-35, 35) * (0.25 + 0.75 * level))
    scale = 1.0 + rs.uniform(-0.45, 0.5) * (0.3 + 0.7 * level)
    tx = rs.uniform(-0.15, 0.15) * GW * level
    ty = rs.uniform(-0.15, 0.15) * GH * level
    cx, cy = GW / 2, GH / 2
    ca, sa = np.cos(ang) * scale, np.sin(ang) * scale
    A = np.array([[ca, -sa, cx - ca * cx + sa * cy + tx],
                  [sa, ca, cy - sa * cx - ca * cy + ty],
                  [0, 0, 1]], np.float64)
    # perspective terms: vanishing-line tilt
    P = np.eye(3)
    P[2, 0] = rs.uniform(-1, 1) * 2e-4 * level
    P[2, 1] = rs.uniform(-1, 1) * 2e-4 * level
    return (P @ A).astype(np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-seq", type=int, default=8)
    args = ap.parse_args()

    rs = np.random.RandomState(args.seed)
    n_pairs = 0
    for s in range(args.n_seq):
        tex = TEXTURES[s % len(TEXTURES)]
        seq_dir = os.path.join(args.outdir, f"v_synth{s:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        base = (tex(rs) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(seq_dir, "1.ppm"),
                    cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
        for i in range(2, 7):
            level = (i - 1) / 5.0  # 0.2 .. 1.0
            Hm = strong_homography(rs, level)
            warped = cv2.warpPerspective(base, Hm, (GW, GH),
                                         flags=cv2.INTER_LINEAR,
                                         borderMode=cv2.BORDER_REFLECT)
            # photometric delta so descriptors can't cheat on raw values
            gain = rs.uniform(0.75, 1.25)
            bias = rs.uniform(-20, 20)
            noisy = np.clip(warped.astype(np.float32) * gain + bias +
                            rs.randn(GH, GW, 3) * 4, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(seq_dir, f"{i}.ppm"),
                        cv2.cvtColor(noisy, cv2.COLOR_RGB2BGR))
            np.savetxt(os.path.join(seq_dir, f"H_1_{i}"), Hm)
            n_pairs += 1
    print(f"wrote {args.n_seq} sequences / {n_pairs} pairs to {args.outdir}")


if __name__ == "__main__":
    main()
