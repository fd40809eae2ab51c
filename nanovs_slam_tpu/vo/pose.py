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
