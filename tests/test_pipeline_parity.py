"""Pipeline-level parity regression tests (VERDICT r2 "Next round" #1).

These feed IDENTICAL inputs through the REFERENCE's metric tails
(/root/reference/src/evaluation/{detector,descriptor}.py) and this
framework's reimplementations and assert the resulting METRICS are equal
— upgrading tensor-level parity ("outputs match") to pipeline-level
parity ("the framework reproduces the reference's numbers").

The full side-by-side harness (both stacks' model+eval loops on the
40-pair fixture / synthetic KITTI) lives in tools/pipeline_parity.py; its
results go to PARITY.md. Here we pin the deterministic metric tails.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference not available")]

# /root/reference on the path exposes the src.* namespace package
for p in (REF, "/root/reference",
          os.path.dirname(os.path.dirname(os.path.abspath(__file__)))):
    if p not in sys.path:
        sys.path.insert(0, p)


def _fake_detections(seed, n1=400, n2=380, shape=(240, 320), d=32):
    """Deterministic pseudo keypoints/descriptors with a mix of genuinely
    corresponding points (warped by H + noise) and distractors."""
    rs = np.random.RandomState(seed)
    Hm = np.array([[1.02, 0.03, 4.0], [-0.02, 0.98, -3.0],
                   [1e-5, -2e-5, 1.0]])
    H_img, W_img = shape
    kp1 = np.stack([rs.uniform(0, W_img - 1, n1),
                    rs.uniform(0, H_img - 1, n1)], axis=1)
    # first half of view-2 points = warped view-1 points + small noise
    ones = np.hstack([kp1, np.ones((n1, 1))])
    w = ones @ Hm.T
    w = w[:, :2] / w[:, 2:3]
    n_match = min(n2, n1) // 2
    kp2 = np.vstack([w[:n_match] + rs.randn(n_match, 2) * 0.5,
                     np.stack([rs.uniform(0, W_img - 1, n2 - n_match),
                               rs.uniform(0, H_img - 1, n2 - n_match)], 1)])
    s1 = rs.uniform(0.5, 1.0, n1)
    s2 = rs.uniform(0.5, 1.0, n2)
    desc1 = rs.randn(n1, d).astype(np.float32)
    desc2 = np.vstack([desc1[:n_match] + rs.randn(n_match, d) * 0.1,
                       rs.randn(n2 - n_match, d)]).astype(np.float32)
    desc1 /= np.linalg.norm(desc1, axis=1, keepdims=True)
    desc2 /= np.linalg.norm(desc2, axis=1, keepdims=True)
    return {
        "image_shape": shape,
        "homography": Hm,
        "prob": np.hstack([kp1, s1[:, None]]),
        "warped_prob": np.hstack([kp2, s2[:, None]]),
        "desc": desc1,
        "warped_desc": desc2,
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_repeatability_tail_equal(seed):
    from src.evaluation.detector import compute_repeatability as ref_rep

    from nanovs_slam_tpu.evaluation.detector import (
        compute_repeatability as our_rep)

    data = _fake_detections(seed)
    rn1, rn2, rrep, rloc = ref_rep(dict(data), keep_k_points=300,
                                   distance_thresh=3)
    on1, on2, orep, oloc = our_rep(dict(data), keep_k_points=300,
                                   distance_thresh=3)
    assert (rn1, rn2) == (on1, on2)
    np.testing.assert_allclose(orep, rrep, rtol=0, atol=0)
    np.testing.assert_allclose(oloc, rloc, rtol=0, atol=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matching_score_tail_equal(seed):
    from src.evaluation.descriptor import (
        compute_matching_score as ref_ms)

    from nanovs_slam_tpu.evaluation.descriptor import (
        compute_matching_score as our_ms)

    data = _fake_detections(seed)
    assert our_ms(dict(data), keep_k_points=300) == \
        ref_ms(dict(data), keep_k_points=300)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_homography_tail_equal(seed):
    """cv2.findHomography RANSAC draws are pinned with cv2.setRNGSeed so
    both stacks see identical estimates."""
    import cv2

    from src.evaluation.descriptor import compute_homography as ref_h

    from nanovs_slam_tpu.evaluation.descriptor import (
        compute_homography as our_h)

    data = _fake_detections(seed)
    cv2.setRNGSeed(123)
    r = ref_h(dict(data), keep_k_points=300)
    cv2.setRNGSeed(123)
    o = our_h(dict(data), keep_k_points=300)
    np.testing.assert_allclose(o, r, rtol=0, atol=0)


def test_pose_error_tail_equal():
    """VO error tail: calculate_pose_error + error stats."""
    from src.visual_odometry.utils import (
        calculate_error_stats as ref_stats,
        calculate_pose_error as ref_pe)

    from nanovs_slam_tpu.vo.pose import (calculate_error_stats as our_stats,
                                         calculate_pose_error as our_pe)

    rs = np.random.RandomState(0)
    errs_r, errs_o = [], []
    for _ in range(10):
        ang = rs.randn(3) * 0.1
        R_gt, _ = __import__("cv2").Rodrigues(ang)
        R_est, _ = __import__("cv2").Rodrigues(ang + rs.randn(3) * 0.02)
        t_gt = rs.randn(3)
        t_est = t_gt + rs.randn(3) * 0.05
        te_r, re_r = ref_pe(R_gt, t_gt, R_est, t_est)
        te_o, re_o = our_pe(R_gt, t_gt, R_est, t_est)
        assert (te_r, re_r) == (te_o, re_o)
        errs_r.append(te_r + re_r)
        errs_o.append(te_o + re_o)
    sr = ref_stats(np.array(errs_r))
    so = our_stats(np.array(errs_o))
    assert {k: float(v) for k, v in sr.items()} == \
        {k: float(v) for k, v in so.items()}
