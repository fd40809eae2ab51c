#!/usr/bin/env python
"""Pose-tail A/B probe: cv2 USAC_MSAC vs ransac_essential_device on the
corridor fixture's BF match populations (VERDICT r3 weak #4 harness).

Stage 1 (slow, cached): run the frontend + BF matcher over consecutive
corridor pairs and cache the normalized correspondences + GT relative
poses to an .npz. Stage 2 (fast, repeatable): score both estimators'
translation-direction / rotation errors over the cached populations —
so solver iterations don't pay the extraction cost.

Usage:
  python tools/pose_tail_probe.py            # both stages as needed
  python tools/pose_tail_probe.py --rebuild  # force stage 1
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

CACHE = os.path.join(_REPO, "fixtures", "pose_tail_matches.npz")


def build_cache(im_h=128, im_w=512, max_frames=30):
    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
    from nanovs_slam_tpu.vo.camera import PinholeCamera, kitti_params
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
    from nanovs_slam_tpu.vo.groundtruth import KittiVideoGroundTruth
    from nanovs_slam_tpu.vo.matcher import match_keypoints
    from nanovs_slam_tpu.vo.visual_odometry import prep_frame

    kitti = os.path.join(_REPO, "fixtures", "kitti_corridor_gray")
    cfg = get_config("S", n_classes=8)
    model = build_model(cfg)
    candidates = [os.path.join(_REPO, "model_ckpt", "r5_long"),
                  os.path.join(_REPO, "pinned", "extractor_S8.npz"),
                  os.path.join(_REPO, "model_ckpt", "r3_long")]
    ckpt = next(p for p in candidates if os.path.exists(p))
    tree, _ = load_checkpoint(ckpt)
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    fe = KP2DTinyFrontend(model, cfg, variables, (im_h, im_w),
                          nn_thresh=0.7, top_k=4000)
    gt = KittiVideoGroundTruth(kitti, "06.txt")
    cap = cv2.VideoCapture(os.path.join(kitti, "06.mp4"))
    frames = []
    while len(frames) < max_frames:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    size = frames[0].shape
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(size[1], size[0], fx, fy, cx, cy)
    sx, sy = size[1] / im_w, size[0] / im_h

    feats = []
    for f in frames:
        pts, feat, _ = fe.run(prep_frame(f, (im_h, im_w)))
        feats.append((pts * np.array([sx, sy]), feat))
        print(f"extracted {len(feats)}/{len(frames)}", file=sys.stderr)

    pairs = []
    for i in range(len(frames) - 1):
        kps0, kps1 = match_keypoints(feats[i][0], feats[i][1],
                                     feats[i + 1][0], feats[i + 1][1])
        kpn0 = cam.unproject_points(cam.undistort_points(kps0))
        kpn1 = cam.unproject_points(cam.undistort_points(kps1))
        # GT relative pose in frame-i camera coordinates
        # (calculate_relative_error composition: est_R = R_last @ R,
        # est_t = t_last + s * R_last @ t)
        t_last, R_last = gt.extract_pose_values(i)
        t_curr, R_curr = gt.extract_pose_values(i + 1)
        R_gt = R_last.T @ R_curr
        t_gt = R_last.T @ (t_curr - t_last).reshape(3, 1)
        pairs.append((kpn0, kpn1, R_gt, t_gt))

    n_max = max(len(p[0]) for p in pairs)
    K0 = np.zeros((len(pairs), n_max, 2), np.float32)
    K1 = np.zeros_like(K0)
    V = np.zeros((len(pairs), n_max), bool)
    Rg = np.stack([p[2] for p in pairs]).astype(np.float32)
    Tg = np.stack([p[3].reshape(3) for p in pairs]).astype(np.float32)
    for i, (a, b, _, _) in enumerate(pairs):
        K0[i, :len(a)] = a
        K1[i, :len(b)] = b
        V[i, :len(a)] = True
    np.savez(CACHE, kpn0=K0, kpn1=K1, valid=V, R_gt=Rg, t_gt=Tg)
    print(f"cached {len(pairs)} pairs (max {n_max} matches) -> {CACHE}")


def t_dir_err_deg(t_est, t_gt):
    t_est = t_est.reshape(3) / max(np.linalg.norm(t_est), 1e-12)
    t_gt = t_gt.reshape(3) / max(np.linalg.norm(t_gt), 1e-12)
    c = abs(float(np.dot(t_est, t_gt)))  # sign-invariant (monocular)
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def r_err_deg(R_est, R_gt):
    c = (np.trace(R_est.T @ R_gt) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--n_hypotheses", type=int, default=2048)
    ap.add_argument("--lo_rounds", type=int, default=2)
    ap.add_argument("--pool", type=int, default=4)
    ap.add_argument("--restarts", type=int, default=3)
    ap.add_argument("--lo_hypotheses", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_cv2", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.rebuild or not os.path.exists(CACHE):
        build_cache()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import cv2

    from nanovs_slam_tpu.vo.pose import ransac_essential_device

    def cv2_tail(kpn0, kpn1):
        """The host pose tail on NORMALIZED points (estimate_pose's
        cv2 calls after unprojection, vo/pose.py:28-33)."""
        method = getattr(cv2, "USAC_MSAC", cv2.RANSAC)
        E, _ = cv2.findEssentialMat(kpn1, kpn0, focal=1, pp=(0.0, 0.0),
                                    method=method, prob=0.999,
                                    threshold=0.0003)
        _, R, t, _ = cv2.recoverPose(E, kpn1, kpn0, focal=1,
                                     pp=(0.0, 0.0))
        return R, t

    d = np.load(CACHE)
    K0, K1, V, Rg, Tg = (d["kpn0"], d["kpn1"], d["valid"], d["R_gt"],
                         d["t_gt"])
    rows = {"cv2": [], "dev": []}
    for i in range(len(K0)):
        kpn0 = K0[i][V[i]]
        kpn1 = K1[i][V[i]]
        if not args.skip_cv2:
            R, t = cv2_tail(kpn0, kpn1)
            rows["cv2"].append((t_dir_err_deg(t, Tg[i]),
                                r_err_deg(R, Rg[i])))
        R, t, inl = ransac_essential_device(
            kpn0, kpn1,
            jax.random.fold_in(jax.random.PRNGKey(args.seed), i),
            n_hypotheses=args.n_hypotheses, lo_rounds=args.lo_rounds,
            pool=args.pool, restarts=args.restarts,
            lo_hypotheses=args.lo_hypotheses)
        R, t = np.asarray(R), np.asarray(t)
        rows["dev"].append((t_dir_err_deg(t, Tg[i]), r_err_deg(R, Rg[i]),
                            int(np.asarray(inl).sum())))
        print(f"pair {i}: dev t_err={rows['dev'][-1][0]:.2f} "
              + (f"cv2 t_err={rows['cv2'][-1][0]:.2f}"
                 if not args.skip_cv2 else ""), file=sys.stderr)

    out = {}
    for name, r in rows.items():
        if not r:
            continue
        te = np.array([x[0] for x in r])
        re = np.array([x[1] for x in r])
        out[name] = {"t_dir_mean_deg": round(float(te.mean()), 3),
                     "t_dir_median_deg": round(float(np.median(te)), 3),
                     "t_dir_p90_deg": round(float(np.percentile(te, 90)),
                                            3),
                     "rot_mean_deg": round(float(re.mean()), 4)}
        if name == "dev":
            out[name]["mean_inliers"] = round(
                float(np.mean([x[2] for x in r])), 1)
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
