"""VO pipeline tests with synthetic geometry."""

import numpy as np
import pytest

import jax

from nanovs_slam_tpu.vo.camera import PinholeCamera, kitti_params
from nanovs_slam_tpu.vo.matcher import (match_keypoints,
                                        ratio_test_match_one_to_one)
from nanovs_slam_tpu.vo.pose import (calculate_error_stats,
                                     calculate_pose_error, estimate_pose)

cv2 = pytest.importorskip("cv2")


def _synthetic_views(n=200, seed=0):
    """Project random 3D points into two cameras with known relative pose."""
    rs = np.random.RandomState(seed)
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(1241, 376, fx, fy, cx, cy)
    pts3d = np.stack([rs.uniform(-10, 10, n), rs.uniform(-3, 3, n),
                      rs.uniform(8, 40, n)], axis=1)
    # relative pose: small rotation around y + forward translation
    ang = 0.03
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([0.1, 0.0, 1.0])
    uv1, z1 = cam.project(pts3d)
    pts3d_2 = (R.T @ (pts3d - t).T).T  # world -> cam2
    uv2, z2 = cam.project(pts3d_2)
    ok = (z1 > 0) & (z2 > 0)
    return cam, uv1[ok], uv2[ok], R, t


def test_estimate_pose_recovers_motion():
    cam, uv1, uv2, R_gt, t_gt = _synthetic_views()
    R, t, mask_match, _ = estimate_pose(uv1, uv2, cam)
    # recoverPose returns the motion up to translation scale
    t_est = t[:, 0] / np.linalg.norm(t)
    t_dir = t_gt / np.linalg.norm(t_gt)
    r_err = calculate_pose_error(R_gt, t_dir, R, t_est)[1]
    assert r_err < 0.01, r_err
    assert abs(np.dot(t_est, t_dir)) > 0.99


def test_ratio_test_matcher_identity():
    rs = np.random.RandomState(0)
    desc = rs.randn(50, 32).astype(np.float32)
    i1, i2, score = ratio_test_match_one_to_one(desc, desc)
    np.testing.assert_array_equal(i1, i2)
    assert len(i1) == 50
    assert np.all(score < 1e-2)  # float32 Gram-identity noise


def test_matcher_matches_cv2_knn():
    rs = np.random.RandomState(1)
    d1 = rs.randn(40, 16).astype(np.float32)
    d2 = rs.randn(60, 16).astype(np.float32)
    i1, i2, _ = ratio_test_match_one_to_one(d1, d2)

    bf = cv2.BFMatcher(cv2.NORM_L2)
    matches = bf.knnMatch(d1, d2, k=2)
    ref_pairs = set()
    best = {}
    for m, n in matches:
        if m.distance > 0.7 * n.distance:
            continue
        if m.trainIdx not in best or m.distance < best[m.trainIdx][1]:
            best[m.trainIdx] = (m.queryIdx, m.distance)
    ref_pairs = {(q, t) for t, (q, _) in best.items()}
    assert set(zip(i1.tolist(), i2.tolist())) == ref_pairs


def test_match_keypoints_top_k():
    rs = np.random.RandomState(2)
    desc = rs.randn(100, 16).astype(np.float32)
    kps = rs.rand(100, 2) * 100
    k0, k1 = match_keypoints(kps, desc, kps, desc, top_k_matches=20)
    assert k0.shape == (20, 2)
    np.testing.assert_allclose(k0, k1)


def test_error_stats():
    e = np.array([1.0, 2.0, 3.0])
    s = calculate_error_stats(e)
    assert s["mean"] == 2.0 and s["sum"] == 6.0 and s["max"] == 3.0


def test_frontend_fixed_shapes():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend

    H, W = 64, 96
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    fe = KP2DTinyFrontend(model, cfg, {"params": params, "batch_stats": bs},
                          (H, W), nn_thresh=0.0, top_k=100)
    img = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)
    pts, feat, out = fe.run(img)
    assert pts.shape[1] == 2 and feat.shape[1] == cfg.nfeatures
    assert len(pts) <= 100
    assert np.all(pts[:, 0] <= W - 1) and np.all(pts[:, 1] <= H - 1)
    # descriptors are L2-normalized by postprocess
    np.testing.assert_allclose(np.linalg.norm(feat, axis=1), 1.0, atol=1e-4)


def test_frontend_semantic_filter():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend

    H, W = 64, 96
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    var = {"params": params, "batch_stats": bs}
    img = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)

    fe_all = KP2DTinyFrontend(model, cfg, var, (H, W), nn_thresh=0.0,
                              top_k=50)
    _, _, out = fe_all.run(img)
    # filter every class -> no keypoints survive
    fe_f = KP2DTinyFrontend(model, cfg, var, (H, W), nn_thresh=0.0,
                            top_k=50, semantic_filter=True,
                            classes_to_filter=list(range(7)))
    pts_f, _, _ = fe_f.run(img)
    assert len(pts_f) == 0


def test_frontend_kp_class_alignment():
    """with_seg=True: per-keypoint classes come back aligned with the
    selected keypoints (the semantic VO matcher's input)."""
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend

    H, W = 64, 96
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    var = {"params": params, "batch_stats": bs}
    img = np.random.RandomState(1).rand(H, W, 3).astype(np.float32)

    fe = KP2DTinyFrontend(model, cfg, var, (H, W), nn_thresh=0.0, top_k=50,
                          with_seg=True)
    pts, feat, out = fe.run(img)
    kp_class = out["kp_class"]
    assert kp_class.shape == (len(pts),)
    assert kp_class.min() >= 0 and kp_class.max() < 7
    # the class at each keypoint equals the argmax seg map sampled at the
    # keypoint's nearest seg-map pixel
    seg_map = out["seg"][0, :, :, 0]
    hs, ws = seg_map.shape
    gx = np.clip(np.round(pts[:, 0] / (W - 1) * (ws - 1)), 0,
                 ws - 1).astype(int)
    gy = np.clip(np.round(pts[:, 1] / (H - 1) * (hs - 1)), 0,
                 hs - 1).astype(int)
    assert (kp_class == seg_map[gy, gx]).mean() > 0.9


def test_draw_feature_tracks_overlay():
    """Inlier tracks drawn as lines/dots (reference drawFeatureTracks,
    visual_odometry.py:439-472); all_tracks ignores the inlier mask."""
    from nanovs_slam_tpu.vo.camera import PinholeCamera
    from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

    vo = VisualOdometry(None, PinholeCamera(64, 48, 64, 64, 32, 24))
    vo.m_kps0 = np.array([[5.0, 5.0], [20.0, 10.0], [40.0, 30.0]])
    vo.m_kps1 = np.array([[8.0, 6.0], [22.0, 12.0], [43.0, 33.0]])
    vo.mask_match = np.array([True, False, True])

    img = np.zeros((48, 64, 3), np.uint8)
    inliers = vo.draw_feature_tracks(img)
    assert inliers.shape == img.shape
    assert (img == 0).all()  # input untouched
    n_inlier_px = int((inliers != 0).any(-1).sum())
    assert n_inlier_px > 0
    everything = vo.draw_feature_tracks(img, all_tracks=True)
    assert int((everything != 0).any(-1).sum()) > n_inlier_px
    # grayscale input path
    gray = vo.draw_feature_tracks(np.zeros((48, 64), np.uint8))
    assert gray.shape == (48, 64, 3)


def test_frontend_u8_equals_float():
    """uint8 frames through the frontend equal the float path on
    u8-representable inputs (the transfer-size fast path moves
    normalization in-graph, it does not change the math)."""
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.image import quantize_u8
    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend

    H, W = 64, 96
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    fe = KP2DTinyFrontend(model, cfg, {"params": params, "batch_stats": bs},
                          (H, W), nn_thresh=0.0, top_k=100)
    img_u8 = quantize_u8(np.random.RandomState(3).rand(H, W, 3))
    img01 = img_u8.astype(np.float32) / 255.0
    pts_a, feat_a, _ = fe.run(img_u8)
    pts_b, feat_b, _ = fe.run(img01)
    # not bitwise: XLA fuses the in-graph /255 into the normalize
    # (fma), a 1-ulp input difference vs the host-division path
    np.testing.assert_allclose(pts_a, pts_b, atol=1e-4)
    np.testing.assert_allclose(feat_a, feat_b, atol=1e-5)


def test_dense_extract_u8_equals_float():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.matching.dense import DenseMatcher
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.ops.image import quantize_u8

    H, W = 64, 96
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    dm = DenseMatcher(model, cfg, {"params": params, "batch_stats": bs},
                      (H, W), k=64)
    img_u8 = quantize_u8(np.random.RandomState(4).rand(H, W, 3))
    fa = np.asarray(dm.extract(img_u8))
    fb = np.asarray(dm.extract(img_u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(fa, fb, atol=1e-6)
