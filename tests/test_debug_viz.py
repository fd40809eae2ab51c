"""Tests for the headless --debug visualization (reference README.md:127-131:
"Use the debug flag to get a visual output of the model's predictions" —
the reference pops cv2.imshow windows; we save PNGs instead)."""

import os

import numpy as np

from nanovs_slam_tpu.utils.debug_viz import (save_keypoint_debug,
                                             save_pair_debug, save_seg_debug)


def test_keypoint_debug_writes_png(tmp_path):
    img = np.random.rand(96, 128, 3).astype(np.float32) * 2 - 1  # model range
    kps = np.random.rand(500, 2) * [128, 96]
    scores = np.random.rand(500)
    path = save_keypoint_debug(str(tmp_path / "kp.png"), img, kps, scores,
                               top_k=300)
    assert os.path.exists(path)
    import cv2

    out = cv2.imread(path)
    assert out.shape == (96, 128, 3)


def test_keypoint_debug_accepts_batched_uint8(tmp_path):
    img = np.random.randint(0, 255, (1, 64, 80, 3), dtype=np.uint8)
    kps = np.array([[10.0, 10.0], [200.0, 200.0]])  # one out of bounds
    path = save_keypoint_debug(str(tmp_path / "kp.png"), img, kps)
    import cv2

    assert cv2.imread(path).shape == (64, 80, 3)


def test_pair_debug_side_by_side(tmp_path):
    img0 = np.random.rand(64, 80, 3).astype(np.float32)
    img1 = np.random.rand(64, 80, 3).astype(np.float32)
    kps = np.random.rand(400, 2) * [80, 64]
    path = save_pair_debug(str(tmp_path / "pair.png"), img0, img1, kps, kps,
                           kps0_warped=kps + 2.0,
                           scores0=np.random.rand(400),
                           scores1=np.random.rand(400), top_k=100)
    import cv2

    out = cv2.imread(path)
    assert out.shape == (64, 160, 3)
    # warped-source circles are green (BGR [0,255,0]) on the right panel
    right = out[:, 80:]
    green = (right[..., 1] == 255) & (right[..., 0] == 0) & (right[..., 2] == 0)
    assert green.any()


def test_seg_debug_panels_and_ignore_label(tmp_path):
    img = np.random.rand(96, 128, 3).astype(np.float32)
    seg = np.random.randint(0, 7, (24, 32))
    seg[0, :] = 255  # ignore label must not index the colormap
    path = save_seg_debug(str(tmp_path / "seg.png"), img, seg, seg_gt=seg,
                          n_classes=7)
    import cv2

    out = cv2.imread(path)
    # input | prediction | GT panels, each at input resolution
    assert out.shape == (96, 128 * 3, 3)
    # ignore rows rendered black (top row of the pred panel, nearest-resized)
    assert out[0, 128 : 2 * 128].max() == 0


def test_seg_debug_without_gt(tmp_path):
    img = np.random.rand(48, 64, 3).astype(np.float32)
    seg = np.random.randint(0, 5, (48, 64))
    path = save_seg_debug(str(tmp_path / "seg.png"), img, seg, n_classes=5)
    import cv2

    assert cv2.imread(path).shape == (48, 64 * 2, 3)
