"""Golden tests for the evaluation metric suite (synthetic fixtures)."""

import numpy as np

from nanovs_slam_tpu.evaluation.descriptor import (bf_match,
                                                   compute_homography,
                                                   compute_matching_score)
from nanovs_slam_tpu.evaluation.detector import (compute_repeatability,
                                                 warp_keypoints)
from nanovs_slam_tpu.evaluation.global_descriptor import (
    evaluate_global_descriptor, knn_l2)
from nanovs_slam_tpu.evaluation.keypoints import cal_error_auc
from nanovs_slam_tpu.evaluation.segmentation import (_reduce, iou_score,
                                                     segmentation_stats)
from nanovs_slam_tpu.evaluation.depth import compute_depth_errors


def _identity_data(n=100, d=16, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.rand(n, 2) * [200, 150] + 10
    scores = rs.rand(n)
    desc = rs.randn(n, d).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    prob = np.concatenate([pts, scores[:, None]], 1)
    return {
        "image_shape": (240, 320),
        "homography": np.eye(3),
        "prob": prob, "warped_prob": prob.copy(),
        "desc": desc, "warped_desc": desc.copy(),
    }


def test_repeatability_identity():
    data = _identity_data()
    n1, n2, rep, loc = compute_repeatability(data, keep_k_points=300)
    assert rep == 1.0 and loc == 0.0 and n1 == n2 == 100


def test_matching_score_identity():
    assert compute_matching_score(_identity_data()) == 1.0


def test_homography_identity():
    c1, c3, c5, dist = compute_homography(_identity_data())
    assert (c1, c3, c5) == (1.0, 1.0, 1.0)
    assert dist < 1e-3


def test_homography_translation():
    data = _identity_data()
    H = np.eye(3)
    H[0, 2] = 5.0  # x shift
    data["homography"] = H
    data["warped_prob"][:, 0] += 5.0
    c1, c3, c5, dist = compute_homography(data)
    assert c5 == 1.0 and dist < 1e-2


def test_warp_keypoints():
    H = np.array([[2.0, 0, 1], [0, 1.0, -2], [0, 0, 1.0]])
    pts = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = warp_keypoints(pts, H)
    np.testing.assert_allclose(out, [[3.0, 0.0], [7.0, 2.0]])


def test_bf_match_crosscheck():
    a = np.eye(4, dtype=np.float32)
    b = a[[1, 0, 3, 2]]
    q, t = bf_match(a, b, cross_check=True)
    np.testing.assert_array_equal(t, [1, 0, 3, 2])


def test_cal_error_auc():
    errors = [0.5, 1.5, 2.5, 10.0]
    aucs = cal_error_auc(errors, [1, 3, 5])
    assert 0 < aucs[1] < aucs[3] < aucs[5] < 1


def test_segmentation_stats_perfect():
    gt = np.random.RandomState(0).randint(0, 5, (2, 8, 8))
    tp, fp, fn, tn = segmentation_stats(gt, gt, 5)
    assert fp.sum() == 0 and fn.sum() == 0
    assert _reduce(iou_score, tp, fp, fn, tn, "micro-imagewise") == 1.0


def test_segmentation_stats_ignore():
    gt = np.full((1, 4, 4), 255)
    gt[0, 0, 0] = 1
    pred = np.ones((1, 4, 4), dtype=np.int64)
    tp, fp, fn, tn = segmentation_stats(pred, gt, 3)
    assert tp[0, 1] == 1 and tp.sum() == 1 and fp.sum() == 0


def test_knn_and_retrieval():
    rs = np.random.RandomState(0)
    db = rs.randn(50, 8).astype(np.float32)
    q = db[[3, 7, 11]] + 0.001  # queries near exact db rows
    idx = knn_l2(q, db, 5)
    np.testing.assert_array_equal(idx[:, 0], [3, 7, 11])

    positives = [np.array([3]), np.array([7]), np.array([999])]  # last misses
    m = evaluate_global_descriptor(db, q, positives)
    assert abs(m["Recall"][1] - 2 / 3) < 1e-9
    assert m["Recall"][20] == m["Recall"][1]  # no later hits for q3


def test_depth_errors_perfect():
    gt = np.random.RandomState(0).rand(2, 16, 16, 1) + 0.5
    m = compute_depth_errors(gt, gt.copy())
    assert m["a1"] == 1.0 and m["rmse"] == 0.0 and m["silog"] < 1e-6
