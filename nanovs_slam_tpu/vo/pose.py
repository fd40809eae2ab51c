"""Pose estimation + error metrics for VO.

Behavioral contract:
- estimate_pose (reference evaluation/visual_odometry.py:139-162):
  undistort -> unproject -> cv2.findEssentialMat (USAC_MSAC, prob .999,
  threshold 3e-4, focal 1, pp (0,0)) -> cv2.recoverPose.
- calculate_pose_error (src/visual_odometry/utils.py:5-19): t = L2 diff,
  r = ||Rodrigues(R_est @ R_gt^T)||.
- calculate_relative_error (evaluation/visual_odometry.py:165-176): apply
  the estimated relative (R, t) with GT scale to the previous GT pose and
  compare to the current GT pose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def estimate_pose(kps_ref: np.ndarray, kps_cur: np.ndarray, cam):
    import cv2

    kp_ref_u = cam.undistort_points(kps_ref)
    kp_cur_u = cam.undistort_points(kps_cur)
    kpn_ref = cam.unproject_points(kp_ref_u)
    kpn_cur = cam.unproject_points(kp_cur_u)
    method = getattr(cv2, "USAC_MSAC", cv2.RANSAC)
    E, mask_match = cv2.findEssentialMat(
        kpn_cur, kpn_ref, focal=1, pp=(0.0, 0.0), method=method,
        prob=0.999, threshold=0.0003)
    _, R, t, mask = cv2.recoverPose(E, kpn_cur, kpn_ref, focal=1,
                                    pp=(0.0, 0.0))
    return R, t, mask_match, mask


def calculate_pose_error(R_gt: np.ndarray, t_gt: np.ndarray,
                         R_est: np.ndarray, t_est: np.ndarray
                         ) -> Tuple[float, float]:
    import cv2

    t_error = float(np.sqrt(((t_est - t_gt) ** 2).sum()))
    r, _ = cv2.Rodrigues(R_est.dot(R_gt.T))
    r_error = float(np.linalg.norm(r))
    return t_error, r_error


def calculate_relative_error(gt, i_frame: int, R: np.ndarray, t: np.ndarray
                             ) -> Tuple[float, float]:
    _, _, _, absolute_scale = gt.get_pose_and_absolute_scale(i_frame - 1)
    t_last, rot_last = gt.extract_pose_values(i_frame - 1)
    est_t = t_last + absolute_scale * rot_last.dot(t).T
    est_R = rot_last.dot(R)
    t_curr, R_curr = gt.extract_pose_values(i_frame)
    return calculate_pose_error(R_curr, t_curr, est_R, est_t[0]
                                if est_t.ndim > 1 else est_t)


def calculate_error_stats(errors: np.ndarray) -> Dict[str, float]:
    return {"mean": float(errors.mean()), "sum": float(errors.sum()),
            "std": float(errors.std()), "max": float(errors.max()),
            "min": float(errors.min())}


def estimate_pose_device(kpn_ref, kpn_cur):
    """On-device essential-matrix pose (the analog of the reference's torch
    pose path, src/visual_odometry/visual_odometry.py:414-437, which solves
    E on-device via kornia and decomposes it with a cheirality check).

    kpn_ref/kpn_cur: (N, 2) NORMALIZED image-plane correspondences (already
    undistorted/unprojected). Uses the 8-point DLT (the reference's own
    fallback branch builds E from a fundamental-matrix fit, :428-432) with
    Hartley normalization, rank-2 projection, the 4-way (R, t)
    decomposition and a midpoint-depth cheirality vote — all jnp ops, so it
    jits/batches (vmap) on TPU. The production VO tail stays cv2 USAC_MSAC
    (robust to outliers); this path serves compiled pipelines fed with
    pre-filtered matches.

    Returns (R (3,3), t (3,1) unit norm, n_positive_depth).
    """
    import jax.numpy as jnp

    # operand order mirrors estimate_pose's cv2 call
    # (findEssentialMat(kpn_cur, kpn_ref) / recoverPose(E, kpn_cur,
    # kpn_ref)) so the returned (R, t) share the cv2 convention
    pts0 = jnp.asarray(kpn_cur, jnp.float32)
    pts1 = jnp.asarray(kpn_ref, jnp.float32)

    def normalize(p):
        mean = p.mean(axis=0)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sqrt(((p - mean) ** 2).sum(-1)).mean(), 1e-9)
        T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        T = T.at[0, 0].set(scale).at[1, 1].set(scale)
        T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
        return (p - mean) * scale, T

    p0, T0 = normalize(pts0)
    p1, T1 = normalize(pts1)
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    # epipolar constraint x1^T E x0 = 0 rows
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                   jnp.ones_like(x0)], axis=1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    E = T1.T @ E @ T0  # denormalize
    # project onto the essential manifold (equal singular values, rank 2)
    u, s, vt = jnp.linalg.svd(E)
    sbar = (s[0] + s[1]) / 2.0
    E = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * sbar) @ vt

    # 4-way decomposition (Hartley & Zisserman 9.19)
    u, _, vt = jnp.linalg.svd(E)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = u @ W @ vt * d
    Rb = u @ W.T @ vt * d
    tu = u[:, 2:3]

    def depth_votes(R, t):
        # midpoint-free linear triangulation depth signs for both cameras
        h0 = jnp.concatenate([pts0, jnp.ones_like(x0[:, None])], -1)  # (N,3)
        h1 = jnp.concatenate([pts1, jnp.ones_like(x1[:, None])], -1)
        # z0 * R h0 + t ~ z1 * h1: solve per-point 2-unknown LSQ
        a = (R @ h0.T).T  # (N, 3)
        b = h1
        # [a, -b] [z0, z1]^T = -t
        M00 = (a * a).sum(-1)
        M01 = -(a * b).sum(-1)
        M11 = (b * b).sum(-1)
        r0 = -(a * t.T).sum(-1)
        r1 = (b * t.T).sum(-1)
        det = M00 * M11 - M01 * M01
        z0 = (M11 * r0 - M01 * r1) / jnp.where(jnp.abs(det) < 1e-12, 1.0,
                                               det)
        z1 = (M00 * r1 - M01 * r0) / jnp.where(jnp.abs(det) < 1e-12, 1.0,
                                               det)
        return ((z0 > 0) & (z1 > 0)).sum()

    cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
    votes = jnp.stack([depth_votes(R, t) for R, t in cands])
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], votes[best]
