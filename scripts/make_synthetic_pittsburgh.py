#!/usr/bin/env python
"""Synthetic Pittsburgh-format VPR fixture (NetVLAD dbStruct .mat).

Layout + struct contract: reference src/data/pittsburgh.py:120-156
(parse order whichSet, dbImage, utmDb, qImage, utmQ, numDb, numQ,
posDistThr, posDistSqThr, nonTrivPosDistSqThr; queries under
queries_real/). P "places" on a 100 m UTM grid, each a distinct smoothed
-noise canvas; db views are small crops of the canvas (few-meter UTM
jitter), queries are crops under brightness/noise/rotation perturbation
— hard enough that NetVLAD-init recall has headroom for the triplet
finetune (train_visloc.py) to improve.

Seeded -> every machine regenerates identical data.
"""

import argparse
import os
import sys

import numpy as np


def make_place_canvas(rs: np.random.RandomState, H: int, W: int,
                      pad: int) -> np.ndarray:
    """Smoothed random texture, same distribution for every place (the
    differences are in the noise draw, not global stats)."""
    import cv2

    h, w = (H + 2 * pad) // 8, (W + 2 * pad) // 8
    base = rs.rand(h, w, 3).astype(np.float32)
    canvas = cv2.resize(base, (W + 2 * pad, H + 2 * pad),
                        interpolation=cv2.INTER_CUBIC)
    # a few random high-contrast rectangles as landmarks
    for _ in range(6):
        y, x = rs.randint(0, H + pad, 2)
        hh, ww = rs.randint(8, 40, 2)
        canvas[y:y + hh, x:x + ww] = rs.rand(3)
    return np.clip(canvas, 0.0, 1.0)


def render_view(canvas: np.ndarray, rs: np.random.RandomState,
                H: int, W: int, pad: int, query: bool) -> np.ndarray:
    import cv2

    dy, dx = rs.randint(0, 2 * pad, 2)
    view = canvas[dy:dy + H, dx:dx + W].copy()
    if query:
        ang = rs.uniform(-4.0, 4.0)
        M = cv2.getRotationMatrix2D((W / 2, H / 2), ang, 1.0)
        view = cv2.warpAffine(view, M, (W, H), borderMode=cv2.BORDER_REFLECT)
        view = view * rs.uniform(0.65, 1.35)
        view = view + rs.randn(H, W, 3).astype(np.float32) * 0.06
    return (np.clip(view, 0.0, 1.0) * 255).astype(np.uint8)


def make_fixture(root: str, n_places: int = 24, db_per_place: int = 3,
                 q_per_place: int = 2, H: int = 192, W: int = 256,
                 seed: int = 0) -> str:
    import cv2
    from scipy.io import savemat

    rs = np.random.RandomState(seed)
    pad = 24
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "queries_real"), exist_ok=True)
    os.makedirs(os.path.join(root, "datasets"), exist_ok=True)

    db_names, utm_db, q_names, utm_q = [], [], [], []
    for p in range(n_places):
        canvas = make_place_canvas(rs, H, W, pad)
        px, py = 100.0 * (p % 6), 100.0 * (p // 6)  # places 100 m apart
        for v in range(db_per_place):
            name = f"images/p{p:03d}_db{v}.jpg"
            cv2.imwrite(os.path.join(root, name),
                        cv2.cvtColor(render_view(canvas, rs, H, W, pad,
                                                 False),
                                     cv2.COLOR_RGB2BGR))
            db_names.append(name)
            utm_db.append([px + rs.uniform(-3, 3), py + rs.uniform(-3, 3)])
        for v in range(q_per_place):
            name = f"p{p:03d}_q{v}.jpg"
            cv2.imwrite(os.path.join(root, "queries_real", name),
                        cv2.cvtColor(render_view(canvas, rs, H, W, pad,
                                                 True),
                                     cv2.COLOR_RGB2BGR))
            q_names.append(name)
            utm_q.append([px + rs.uniform(-3, 3), py + rs.uniform(-3, 3)])

    num_db, num_q = len(db_names), len(q_names)
    struct = {
        "whichSet": "train",
        # column cell orientation (one row per image) like the real
        # NetVLAD mats, so parse_db_struct iterates entries not rows
        "dbImage": np.array(db_names, dtype=object).reshape(-1, 1),
        "utmDb": np.asarray(utm_db, np.float64).T,   # (2, numDb)
        "qImage": np.array(q_names, dtype=object).reshape(-1, 1),
        "utmQ": np.asarray(utm_q, np.float64).T,
        "numDb": float(num_db),
        "numQ": float(num_q),
        "posDistThr": 25.0,
        "posDistSqThr": 625.0,
        "nonTrivPosDistSqThr": 100.0,
    }
    mat = os.path.join(root, "datasets", "pitts30k_train.mat")
    savemat(mat, {"dbStruct": struct})
    print(f"wrote {num_db} db + {num_q} query images -> {root}")
    return mat


def ensure_synthetic_pittsburgh(root: str = "fixtures/pitts_synth",
                                seed: int = 0) -> str:
    """Generate once; repo-anchored when given a relative root."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isabs(root):
        root = os.path.join(repo, root)
    mat = os.path.join(root, "datasets", "pitts30k_train.mat")
    if not os.path.exists(mat):
        make_fixture(root, seed=seed)
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="fixtures/pitts_synth")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sys.exit(0 if make_fixture(args.root, seed=args.seed) else 1)
