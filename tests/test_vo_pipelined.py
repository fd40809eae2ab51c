"""Pipelined VO frame loop (SURVEY §7.3: overlap device extraction with
the host RANSAC tail): begin_extract/prefetched must be bit-identical to
the sequential path, and the async frontend surface must match run()."""

import numpy as np
import pytest

import jax

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.vo.camera import PinholeCamera
from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
from nanovs_slam_tpu.vo.visual_odometry import VisualOdometry

pytest.importorskip("cv2")

H, W = 96, 128


def _frames(n=4, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.rand(H + 32, W + 32, 3).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (0, 0), 2.0) + 0.2 * base
    base = np.clip(base, 0, 1)
    return [base[8:8 + H, 8 + 4 * i:8 + 4 * i + W] for i in range(n)]


@pytest.fixture(scope="module")
def fe():
    cfg = get_config("N", n_classes=8)
    model = build_model(cfg)
    p, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    return KP2DTinyFrontend(model, cfg, {"params": p, "batch_stats": bs},
                            (H, W), nn_thresh=0.0, top_k=256)


def test_run_async_fetch_equals_run(fe):
    img = _frames(1)[0]
    kp_a, d_a, out_a = fe.fetch(fe.run_async(img))
    kp_b, d_b, out_b = fe.run(img)
    np.testing.assert_array_equal(kp_a, kp_b)
    np.testing.assert_array_equal(d_a, d_b)


def test_prefetched_process_identical(fe):
    cam = PinholeCamera(W, H, 120.0, 120.0, W / 2, H / 2)
    frames = _frames(4)

    vo_seq = VisualOdometry(fe, cam, matcher="bf", top_k_matches=256)
    vo_seq.init(frames[0])
    for f in frames[1:]:
        vo_seq.process_image(f)

    vo_pipe = VisualOdometry(fe, cam, matcher="bf", top_k_matches=256)
    vo_pipe.init(frames[0])
    pending = vo_pipe.begin_extract(frames[1])
    for i, f in enumerate(frames[1:]):
        nxt = (vo_pipe.begin_extract(frames[i + 2])
               if i + 2 < len(frames) else None)
        vo_pipe.process_image(f, prefetched=pending)
        pending = nxt

    assert vo_seq.estimation_fails == vo_pipe.estimation_fails
    np.testing.assert_allclose(
        np.concatenate([t.reshape(3) for t in vo_seq.trajectory]),
        np.concatenate([t.reshape(3) for t in vo_pipe.trajectory]),
        atol=1e-9)
    assert vo_seq.stats.n_matches == vo_pipe.stats.n_matches
