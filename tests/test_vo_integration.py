"""VO end-to-end integration on a synthetic 3D sequence with known poses.

A camera translates through a random 3D point cloud; each frame's
'frontend' output is the projected points with descriptors tied to point
identity (+noise). The full VisualOdometry loop (matching -> essential
matrix -> pose integration with GT scale) must recover the trajectory.
"""

import numpy as np
import pytest

from nanovs_slam_tpu.vo.camera import PinholeCamera, kitti_params
from nanovs_slam_tpu.vo.pose import calculate_pose_error
from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")


class SyntheticFrontend:
    """Projects a fixed 3D point cloud from a moving camera."""

    def __init__(self, cam, n_points=400, seed=0):
        rs = np.random.RandomState(seed)
        self.cam = cam
        self.pts3d = np.stack([
            rs.uniform(-15, 15, n_points), rs.uniform(-4, 4, n_points),
            rs.uniform(10, 60, n_points)], axis=1)
        self.desc = rs.randn(n_points, 32).astype(np.float32)
        self.desc /= np.linalg.norm(self.desc, axis=1, keepdims=True)
        self.R = np.eye(3)
        self.t = np.zeros(3)
        self.noise = rs

    def set_pose(self, R, t):
        self.R, self.t = R, t

    def run(self, img01):
        pc = (self.R.T @ (self.pts3d - self.t).T).T  # world -> cam
        uv, z = self.cam.project(pc)
        ok = ((z > 1.0) & (uv[:, 0] >= 0) & (uv[:, 0] < self.cam.width)
              & (uv[:, 1] >= 0) & (uv[:, 1] < self.cam.height))
        d = self.desc[ok] + self.noise.randn(ok.sum(), 32).astype(
            np.float32) * 0.02
        return uv[ok].astype(np.float32), d, {}


def test_vo_recovers_straight_trajectory():
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    fe = SyntheticFrontend(cam)
    vo = VisualOdometry(fe, cam, matcher="bf", top_k_matches=300)

    step = np.array([0.05, 0.0, 1.0])  # forward + slight lateral
    fe.set_pose(np.eye(3), np.zeros(3))
    vo.init(None)

    n_frames = 6
    scale = np.linalg.norm(step)
    for i in range(1, n_frames):
        fe.set_pose(np.eye(3), step * i)
        R, t, n_matches = vo.process_image(None, absolute_scale=scale)
        assert n_matches > 50

    # integrated translation must match the GT trajectory direction+length
    est_t = vo.cur_t[:, 0]
    gt_t = step * (n_frames - 1)
    err = np.linalg.norm(est_t - gt_t)
    assert err < 0.15 * np.linalg.norm(gt_t), (est_t, gt_t)
    # rotation stays near identity
    r_err = calculate_pose_error(np.eye(3), gt_t, vo.cur_R, est_t)[1]
    assert r_err < 0.02


def test_vo_device_pose_recovers_trajectory():
    """device_pose=True: the host cv2 USAC_MSAC tail is replaced by the
    on-device batched RANSAC (pose.ransac_essential_device) and the full
    VO loop still recovers the trajectory to the same tolerance."""
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    fe = SyntheticFrontend(cam, seed=2)
    vo = VisualOdometry(fe, cam, matcher="bf", top_k_matches=300,
                        device_pose=True)

    step = np.array([0.05, 0.0, 1.0])
    fe.set_pose(np.eye(3), np.zeros(3))
    vo.init(None)
    n_frames = 6
    scale = np.linalg.norm(step)
    for i in range(1, n_frames):
        fe.set_pose(np.eye(3), step * i)
        R, t, n_matches = vo.process_image(None, absolute_scale=scale)
        assert n_matches > 50
        assert vo.stats.n_inliers[-1] > 0.5 * n_matches

    est_t = vo.cur_t[:, 0]
    gt_t = step * (n_frames - 1)
    err = np.linalg.norm(est_t - gt_t)
    assert err < 0.15 * np.linalg.norm(gt_t), (est_t, gt_t)
    r_err = calculate_pose_error(np.eye(3), gt_t, vo.cur_R, est_t)[1]
    assert r_err < 0.02
    assert vo.estimation_fails == 0
    # one jitted program served the whole sequence (single slot bucket)
    assert len(vo._pose_jit) == 1


def test_vo_handles_estimation_failure():
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)

    class EmptyFrontend:
        def run(self, img01):
            return (np.zeros((0, 2), np.float32),
                    np.zeros((0, 32), np.float32), {})

    vo = VisualOdometry(EmptyFrontend(), cam)
    vo.init(None)
    R, t, n = vo.process_image(None)  # must not raise (identity fallback)
    assert vo.estimation_fails == 1
    np.testing.assert_array_equal(R, np.eye(3))


def test_corridor_fixture_geometry(tmp_path):
    """make_corridor_sequence: KITTI-format output, correct GT step
    norms, textured non-degenerate frames (scripts/make_synthetic_kitti:
    the parity fixture for tools/pipeline_parity.py --task vo)."""
    import sys

    import cv2
    import numpy as np

    sys.path.insert(0, "scripts")
    from make_synthetic_kitti import make_corridor_sequence

    out = str(tmp_path / "corr")
    step = make_corridor_sequence(out, n_frames=6, W_img=320, H_img=96,
                                  seed=3)
    poses = np.loadtxt(f"{out}/06.txt")
    assert poses.shape == (6, 12)
    Ps = poses.reshape(6, 3, 4)
    # per-frame translation magnitude equals the commanded step
    for i in range(5):
        d = np.linalg.norm(Ps[i + 1][:, 3] - Ps[i][:, 3])
        np.testing.assert_allclose(d, step, rtol=1e-5)
    # rotations are valid (det=1, orthonormal)
    for P in Ps:
        R = P[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    cap = cv2.VideoCapture(f"{out}/06.mp4")
    frames = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    assert len(frames) == 6
    f0, f1 = frames[0].astype(np.float32), frames[1].astype(np.float32)
    assert f0.std() > 20.0            # textured, not flat
    assert np.abs(f0 - f1).mean() > 1.0   # the camera actually moved
    # gray fixture: channels near-identical up to mp4 chroma compression
    # (parity: ref feeds BGR, we RGB — gray makes the inputs equivalent)
    assert np.abs(f0[..., 0] - f0[..., 2]).mean() < 2.0
