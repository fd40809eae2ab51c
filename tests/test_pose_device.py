"""Device camera twin + on-device essential pose (reference
PinholeCameraTorch camera.py:158-253 and estimatePoseTorch
visual_odometry.py:414-437 analogs)."""

import numpy as np
import pytest

from nanovs_slam_tpu.vo.camera import (PinholeCamera, PinholeCameraDevice,
                                       kitti_params)
from nanovs_slam_tpu.vo.pose import calculate_pose_error, estimate_pose_device

cv2 = pytest.importorskip("cv2")


def _cams():
    fx, fy, cx, cy = kitti_params()
    return (PinholeCamera(1241, 376, fx, fy, cx, cy),
            PinholeCameraDevice(1241, 376, fx, fy, cx, cy))


def test_device_camera_matches_host():
    host, dev = _cams()
    rs = np.random.RandomState(0)
    pts3d = np.stack([rs.uniform(-10, 10, 200), rs.uniform(-3, 3, 200),
                      rs.uniform(5, 50, 200)], 1).astype(np.float32)
    uv_h, z_h = host.project(pts3d)
    uv_d, z_d = dev.project(pts3d)
    np.testing.assert_allclose(np.asarray(uv_d), uv_h, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z_d), z_h, rtol=1e-6)
    n_h = host.unproject_points(uv_h.astype(np.float64))
    n_d = dev.unproject_points(np.asarray(uv_d))
    np.testing.assert_allclose(np.asarray(n_d), n_h, atol=1e-4)
    vis = np.asarray(dev.are_in_image(uv_d, z_d))
    assert vis.dtype == bool and vis.any()
    # batched (B, N, 3) shape path
    uv_b, z_b = dev.project(pts3d[None].repeat(2, 0))
    assert uv_b.shape == (2, 200, 2)


def test_estimate_pose_device_recovers_motion():
    host, dev = _cams()
    rs = np.random.RandomState(1)
    pts3d = np.stack([rs.uniform(-15, 15, 250), rs.uniform(-4, 4, 250),
                      rs.uniform(10, 60, 250)], 1)
    t_gt = np.array([0.3, 0.05, 1.0])
    angle = 0.02
    R_gt, _ = cv2.Rodrigues(np.array([0.0, angle, 0.0]))
    # view 0 at origin; view 1 at (R_gt, t_gt): camera-frame points
    pc0 = pts3d
    pc1 = (R_gt.T @ (pts3d - t_gt).T).T
    uv0, z0 = host.project(pc0)
    uv1, z1 = host.project(pc1)
    ok = (z0 > 0) & (z1 > 0)
    kpn0 = host.unproject_points(uv0[ok])
    kpn1 = host.unproject_points(uv1[ok])

    R, t, votes = estimate_pose_device(kpn0, kpn1)
    R, t = np.asarray(R), np.asarray(t)
    assert int(votes) > 0.9 * ok.sum()
    # compare against the cv2 recoverPose convention on the same data
    E, _ = cv2.findEssentialMat(kpn1, kpn0, focal=1, pp=(0.0, 0.0),
                                method=cv2.RANSAC, prob=0.999,
                                threshold=3e-4)
    _, R_cv, t_cv, _ = cv2.recoverPose(E, kpn1, kpn0, focal=1, pp=(0., 0.))
    t_err, r_err = calculate_pose_error(R_cv, t_cv[:, 0], R, t[:, 0])
    assert r_err < 0.01, (r_err, R, R_cv)
    # unit translation direction matches up to the convention
    assert min(np.linalg.norm(t[:, 0] - t_cv[:, 0]),
               np.linalg.norm(t[:, 0] + t_cv[:, 0])) < 0.05


def test_ransac_essential_device_rejects_outliers():
    """Device RANSAC (one XLA program: batched 8-point hypotheses + MSAC
    + weighted refit) recovers the pose from 35% outliers and flags them
    in the inlier mask — the robustness property the host tail gets from
    cv2 USAC_MSAC."""
    import jax

    from nanovs_slam_tpu.vo.pose import ransac_essential_device

    host, _ = _cams()
    rs = np.random.RandomState(7)
    n = 300
    pts3d = np.stack([rs.uniform(-15, 15, n), rs.uniform(-4, 4, n),
                      rs.uniform(10, 60, n)], 1)
    t_gt = np.array([0.2, -0.1, 1.0])
    R_gt, _ = cv2.Rodrigues(np.array([0.01, 0.03, -0.005]))
    pc0 = pts3d
    pc1 = (R_gt.T @ (pts3d - t_gt).T).T
    uv0, z0 = host.project(pc0)
    uv1, z1 = host.project(pc1)
    ok = (z0 > 0) & (z1 > 0)
    kpn0 = host.unproject_points(uv0[ok]).astype(np.float64)
    kpn1 = host.unproject_points(uv1[ok]).astype(np.float64)
    m = len(kpn0)
    n_out = int(0.35 * m)
    bad = rs.choice(m, n_out, replace=False)
    kpn1_noisy = kpn1.copy()
    kpn1_noisy[bad] += rs.uniform(-0.08, 0.08, (n_out, 2))  # gross outliers

    R, t, inl = ransac_essential_device(
        kpn0, kpn1_noisy, jax.random.PRNGKey(0))
    R, t, inl = np.asarray(R), np.asarray(t), np.asarray(inl)

    # pose close to cv2 USAC on the SAME contaminated data
    E, _ = cv2.findEssentialMat(kpn1_noisy, kpn0, focal=1, pp=(0.0, 0.0),
                                method=getattr(cv2, "USAC_MSAC",
                                               cv2.RANSAC),
                                prob=0.999, threshold=3e-4)
    _, R_cv, t_cv, _ = cv2.recoverPose(E, kpn1_noisy, kpn0, focal=1,
                                       pp=(0., 0.))
    t_err, r_err = calculate_pose_error(R_cv, t_cv[:, 0], R, t[:, 0])
    assert r_err < 0.01, r_err
    assert min(np.linalg.norm(t[:, 0] - t_cv[:, 0]),
               np.linalg.norm(t[:, 0] + t_cv[:, 0])) < 0.05
    # the inlier mask separates the populations
    clean = np.ones(m, bool)
    clean[bad] = False
    assert inl[clean].mean() > 0.9, inl[clean].mean()
    assert inl[bad].mean() < 0.1, inl[bad].mean()


def test_ransac_essential_device_padded_and_jitted():
    """Static-shape contract: padded slots behind a validity mask don't
    change the result, and the whole estimator jits."""
    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.vo.pose import ransac_essential_device

    host, _ = _cams()
    rs = np.random.RandomState(3)
    n = 200
    pts3d = np.stack([rs.uniform(-15, 15, n), rs.uniform(-4, 4, n),
                      rs.uniform(10, 60, n)], 1)
    t_gt = np.array([0.0, 0.0, 1.0])
    pc1 = pts3d - t_gt
    uv0, z0 = host.project(pts3d)
    uv1, z1 = host.project(pc1)
    ok = (z0 > 0) & (z1 > 0)
    kpn0 = host.unproject_points(uv0[ok])
    kpn1 = host.unproject_points(uv1[ok])
    m = len(kpn0)

    key = jax.random.PRNGKey(1)
    R0, t0, inl0 = ransac_essential_device(kpn0, kpn1, key)

    pad = 64
    kpn0_p = np.concatenate([kpn0, np.full((pad, 2), 9.9)])
    kpn1_p = np.concatenate([kpn1, np.full((pad, 2), -9.9)])
    valid = np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
    fn = jax.jit(lambda a, b, k, v: ransac_essential_device(a, b, k,
                                                            valid=v))
    R1, t1, inl1 = fn(kpn0_p, kpn1_p, key, valid)
    np.testing.assert_allclose(np.asarray(R0), np.asarray(R1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-4)
    assert not np.asarray(inl1)[m:].any()  # padded slots never inliers
