"""VO matcher surface (VERDICT r1 #6): semantic matching wired into
VisualOdometry, FLANN and crosscheck+model-fit variants, and populated
inference/pose timing stats.
"""

import numpy as np
import pytest

from nanovs_slam_tpu.vo.camera import PinholeCamera, kitti_params
from nanovs_slam_tpu.vo.matcher import (match_crosscheck_fundamental,
                                        match_keypoints,
                                        match_keypoints_flann)
from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

cv2 = pytest.importorskip("cv2")

from test_vo_integration import SyntheticFrontend  # noqa: E402


class SemanticSyntheticFrontend(SyntheticFrontend):
    """Synthetic frontend that also reports a per-keypoint class."""

    def __init__(self, cam, n_points=400, seed=0, n_classes=5):
        super().__init__(cam, n_points, seed)
        rs = np.random.RandomState(seed + 1)
        self.classes = rs.randint(0, n_classes, n_points)

    def run(self, img01):
        pc = (self.R.T @ (self.pts3d - self.t).T).T
        uv, z = self.cam.project(pc)
        ok = ((z > 1.0) & (uv[:, 0] >= 0) & (uv[:, 0] < self.cam.width)
              & (uv[:, 1] >= 0) & (uv[:, 1] < self.cam.height))
        d = self.desc[ok] + self.noise.randn(ok.sum(), 32).astype(
            np.float32) * 0.02
        return (uv[ok].astype(np.float32), d,
                {"kp_class": self.classes[ok]})


def _run_vo(matcher, frontend_cls=SyntheticFrontend, n_frames=6):
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    fe = frontend_cls(cam)
    vo = VisualOdometry(fe, cam, matcher=matcher, top_k_matches=300,
                        n_classes=5)
    step = np.array([0.05, 0.0, 1.0])
    fe.set_pose(np.eye(3), np.zeros(3))
    vo.init(None)
    scale = np.linalg.norm(step)
    for i in range(1, n_frames):
        fe.set_pose(np.eye(3), step * i)
        vo.process_image(None, absolute_scale=scale)
    est_t = vo.cur_t[:, 0]
    gt_t = step * (n_frames - 1)
    assert np.linalg.norm(est_t - gt_t) < 0.2 * np.linalg.norm(gt_t), \
        (matcher, est_t, gt_t)
    return vo


@pytest.mark.parametrize("matcher,fe", [
    ("flann", SyntheticFrontend),
    ("crosscheck", SyntheticFrontend),
    ("semantic", SemanticSyntheticFrontend),
])
def test_vo_matcher_variants_recover_trajectory(matcher, fe):
    vo = _run_vo(matcher, fe)
    assert vo.estimation_fails == 0
    assert min(vo.stats.n_matches) > 30


def test_vo_semantic_without_classes_raises():
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    fe = SyntheticFrontend(cam)  # no kp_class in output
    vo = VisualOdometry(fe, cam, matcher="semantic")
    fe.set_pose(np.eye(3), np.zeros(3))
    vo.init(None)
    fe.set_pose(np.eye(3), np.array([0.0, 0.0, 1.0]))
    with pytest.raises(ValueError):
        vo.process_image(None)


def test_vo_timing_stats_populated():
    vo = _run_vo("bf")
    s = vo.stats.as_dict()
    # init + 5 frames of inference; 5 pose estimations
    assert len(vo.stats.network_inference_timing) == 6
    assert len(vo.stats.pose_estimation_timing) == 5
    assert s["network_inference_timing"]["mean"] > 0
    assert s["pose_estimation_timing"]["mean"] > 0


def test_flann_agrees_with_exact_on_separable_descs():
    rs = np.random.RandomState(0)
    desc = rs.randn(200, 32).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    kps = rs.rand(200, 2).astype(np.float32) * 100
    noisy = desc + rs.randn(200, 32).astype(np.float32) * 0.01
    k0e, k1e = match_keypoints(kps, desc, kps, noisy, 0)
    k0f, k1f = match_keypoints_flann(kps, desc, kps, noisy, 0)
    # approximate search on well-separated descriptors finds nearly all
    # the exact matches
    exact = {tuple(a) + tuple(b) for a, b in zip(k0e, k1e)}
    flann = {tuple(a) + tuple(b) for a, b in zip(k0f, k1f)}
    assert len(flann & exact) >= 0.95 * len(exact)


def test_crosscheck_filters_outliers():
    rs = np.random.RandomState(1)
    n = 150
    desc = rs.randn(n, 32).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    kps0 = rs.rand(n, 2).astype(np.float32) * 200
    # inlier geometry: pure shift; a few corrupted correspondences
    kps1 = kps0 + np.array([5.0, 2.0], np.float32)
    kps1[:10] = rs.rand(10, 2).astype(np.float32) * 200
    k0, k1 = match_crosscheck_fundamental(kps0, desc, kps1, desc + 0.001)
    assert len(k0) > 100
    shift = k1 - k0
    med = np.median(shift, axis=0)
    assert np.allclose(med, [5.0, 2.0], atol=0.5)
