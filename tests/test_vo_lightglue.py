"""VO with the LightGlue matcher path (padded fixed-N matching)."""

import numpy as np
import pytest

import jax

from nanovs_slam_tpu.matching.lightglue import LightGlue, LightGlueConfig
from nanovs_slam_tpu.vo.camera import PinholeCamera, kitti_params
from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

pytest.importorskip("cv2")


class CloudFrontend:
    """Projected 3D cloud with identity-tied descriptors (see
    test_vo_integration)."""

    def __init__(self, cam, n_points=150, seed=0):
        rs = np.random.RandomState(seed)
        self.cam = cam
        self.pts3d = np.stack([
            rs.uniform(-15, 15, n_points), rs.uniform(-4, 4, n_points),
            rs.uniform(10, 60, n_points)], axis=1)
        self.desc = rs.randn(n_points, 32).astype(np.float32)
        self.desc /= np.linalg.norm(self.desc, axis=1, keepdims=True)
        self.t = np.zeros(3)

    def run(self, img01):
        pc = self.pts3d - self.t
        uv, z = self.cam.project(pc)
        ok = ((z > 1) & (uv[:, 0] >= 0) & (uv[:, 0] < self.cam.width)
              & (uv[:, 1] >= 0) & (uv[:, 1] < self.cam.height))
        return uv[ok].astype(np.float32), self.desc[ok], {}


@pytest.mark.slow
def test_vo_lightglue_matching_runs():
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    fe = CloudFrontend(cam)

    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=2,
                          num_heads=4)
    model = LightGlue(cfg)
    dummy = {
        "keypoints0": np.zeros((1, 8, 2), np.float32),
        "keypoints1": np.zeros((1, 8, 2), np.float32),
        "descriptors0": np.zeros((1, 8, 32), np.float32),
        "descriptors1": np.zeros((1, 8, 32), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]

    vo = VisualOdometry(fe, cam, matcher="lightglue",
                        lightglue=(model, params, (1241, 376), 256))
    vo.init(None)
    fe.t = np.array([0.05, 0.0, 1.0])
    R, t, n_matches = vo.process_image(None, absolute_scale=1.0)
    # random-init LightGlue may match few points; the plumbing must not
    # crash and shapes must be consistent
    assert R.shape == (3, 3)
    assert n_matches >= 0


@pytest.mark.slow
def test_vo_lightglue_width_pruning_matches_plain():
    """VO's LightGlue path dispatches through inference_forward, so a
    config with width_confidence > 0 engages static-bucket pruning
    (vo_eval --lg_width). With <=128 valid keypoints (the final bucket)
    and width_confidence=1.0 the pruned program is exactly the plain
    forward, so the two VO runs must produce identical poses."""
    import dataclasses

    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)

    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=2,
                          num_heads=4)
    dummy = {
        "keypoints0": np.zeros((1, 8, 2), np.float32),
        "keypoints1": np.zeros((1, 8, 2), np.float32),
        "descriptors0": np.zeros((1, 8, 32), np.float32),
        "descriptors1": np.zeros((1, 8, 32), np.float32),
    }
    # train=True init creates the per-layer assigner heads width pruning
    # reads (a trained train_lightglue.py checkpoint always has them)
    params = LightGlue(cfg).init(jax.random.PRNGKey(0), dummy,
                                 train=True)["params"]

    results = {}
    for wc in (-1.0, 1.0):
        fe = CloudFrontend(cam, n_points=100)  # 100 <= min_bucket
        model = LightGlue(dataclasses.replace(cfg, width_confidence=wc))
        vo = VisualOdometry(fe, cam, matcher="lightglue",
                            lightglue=(model, params, (1241, 376), 256))
        vo.init(None)
        fe.t = np.array([0.05, 0.0, 1.0])
        results[wc] = vo.process_image(None, absolute_scale=1.0)

    (R0, t0, n0), (R1, t1, n1) = results[-1.0], results[1.0]
    assert n0 == n1
    np.testing.assert_allclose(R0, R1, atol=0)
    np.testing.assert_allclose(t0, t1, atol=0)
