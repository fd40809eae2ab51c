"""Golden tests of core ops against torch reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.modules.blocks import pixel_shuffle, pixel_unshuffle
from nanovs_slam_tpu.modules.aggregators import adaptive_avg_pool_2d
from nanovs_slam_tpu.ops.grid import decode_coords, image_grid, remove_border
from nanovs_slam_tpu.ops.grid_sample import (grid_sample,
                                             sample_descriptors)
from nanovs_slam_tpu.ops.postprocess import top_k_keypoints

torch = pytest.importorskip("torch")


def test_pixel_shuffle_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 7, 16).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    theirs = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6)


def test_pixel_unshuffle_matches_torch():
    x = np.random.RandomState(1).randn(2, 8, 12, 3).astype(np.float32)
    ours = pixel_unshuffle(jnp.asarray(x), 4)
    theirs = torch.nn.functional.pixel_unshuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 4).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(mode):
    rs = np.random.RandomState(2)
    img = rs.randn(2, 9, 13, 4).astype(np.float32)
    grid = (rs.rand(2, 6, 5, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode)
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(grid),
        mode=mode, align_corners=True, padding_mode="zeros",
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_sample_descriptors_l2norm():
    rs = np.random.RandomState(3)
    feat = rs.randn(1, 60, 80, 32).astype(np.float32)
    coords = (rs.rand(1, 50, 2) * np.array([319.0, 239.0])).astype(np.float32)
    out = sample_descriptors(jnp.asarray(feat), jnp.asarray(coords), 240, 320)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # parity vs torch grid_sample + manual normalize (kp2dtiny.py:627-631)
    coord_norm = np.stack([coords[..., 0] / (319.0 / 2) - 1,
                           coords[..., 1] / (239.0 / 2) - 1],
                          axis=-1).astype(np.float32)
    t = torch.nn.functional.grid_sample(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        torch.from_numpy(coord_norm[:, :, None, :]), align_corners=True)
    t = (t / t.norm(p=2, dim=1, keepdim=True)).numpy()[:, :, :, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), t, rtol=1e-4, atol=1e-5)


def test_decode_coords_reference_formula():
    """coord = grid*cell + step + shift*cross_ratio*step, clamped
    (kp2dtiny.py:593-614), cell=4, 240x320 -> Hc=60, Wc=80."""
    cell, H, W = 4, 240, 320
    Hc, Wc = H // cell, W // cell
    rs = np.random.RandomState(4)
    shift = (rs.rand(1, Hc, Wc, 2).astype(np.float32) * 2 - 1)
    coord = np.asarray(decode_coords(jnp.asarray(shift), H, W, cell))
    step = (cell - 1) / 2.0
    xs = np.arange(Wc)[None, :] * cell + step
    ys = np.arange(Hc)[:, None] * cell + step
    exp_x = np.clip(xs[None] + shift[..., 0] * 2.0 * step, 0, W - 1)
    exp_y = np.clip(ys[None] + shift[..., 1] * 2.0 * step, 0, H - 1)
    np.testing.assert_allclose(coord[..., 0], exp_x, rtol=1e-5)
    np.testing.assert_allclose(coord[..., 1], exp_y, rtol=1e-5)


def test_remove_border():
    s = jnp.ones((1, 5, 6, 1))
    out = np.asarray(remove_border(s))[0, :, :, 0]
    assert out[0].sum() == 0 and out[-1].sum() == 0
    assert out[:, 0].sum() == 0 and out[:, -1].sum() == 0
    assert out[1:-1, 1:-1].min() == 1.0


def test_top_k_keypoints():
    rs = np.random.RandomState(5)
    score = rs.rand(2, 8, 10, 1).astype(np.float32)
    coord = rs.rand(2, 8, 10, 2).astype(np.float32)
    feat = rs.rand(2, 8, 10, 16).astype(np.float32)
    kp, s, d, valid = top_k_keypoints(jnp.asarray(score), jnp.asarray(coord),
                                      jnp.asarray(feat), k=12,
                                      conf_threshold=0.7)
    assert kp.shape == (2, 12, 2) and d.shape == (2, 12, 16)
    flat = score.reshape(2, -1)
    exp = -np.sort(-flat, axis=1)[:, :12]
    np.testing.assert_allclose(np.asarray(s), exp, rtol=1e-6)
    assert np.array_equal(np.asarray(valid), exp > 0.7)


def test_adaptive_avg_pool_matches_torch():
    rs = np.random.RandomState(6)
    x = rs.randn(2, 15, 20, 8).astype(np.float32)
    ours = adaptive_avg_pool_2d(jnp.asarray(x), 4, 4)
    theirs = torch.nn.AdaptiveAvgPool2d((4, 4))(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_image_grid_layout():
    g = np.asarray(image_grid(3, 4))
    assert g.shape == (3, 4, 2)
    np.testing.assert_array_equal(g[0, :, 0], [0, 1, 2, 3])  # x = cols
    np.testing.assert_array_equal(g[:, 0, 1], [0, 1, 2])  # y = rows
