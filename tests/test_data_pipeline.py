"""Data pipeline tests: synthetic dataset, device-side pair building,
homography warp consistency, class-map LUTs, HPatches homography scaling."""

import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.data.class_maps import (cityscapes_lut, cocostuff_lut,
                                             remap_mask)
from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
from nanovs_slam_tpu.data.homography import (homography_warp_image,
                                             sample_homography)
from nanovs_slam_tpu.data.hpatches import scale_homography
from nanovs_slam_tpu.data.pipeline import PairLoader, build_pair_batch
from nanovs_slam_tpu.losses.keypoint import warp_coords_homography


def test_synthetic_dataset():
    ds = SyntheticShapesDataset((48, 64), 8, n_classes=5, with_depth=True)
    item = ds[0]
    assert item["image"].shape == (48, 64, 3)
    assert item["seg"].shape == (48, 64) and item["seg"].max() < 5
    assert item["depth"].shape == (48, 64, 1)
    # deterministic per index
    np.testing.assert_array_equal(ds[3]["seg"], ds[3]["seg"])


def test_pair_loader_batches():
    ds = SyntheticShapesDataset((48, 64), 12, n_classes=5)
    loader = PairLoader(ds, batch_size=4, im_h=48, im_w=64, d_f=2,
                        train=True)
    assert len(loader) == 3
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 48, 64, 3)
    assert batch["image_aug"].shape == (4, 48, 64, 3)
    assert batch["seg"].shape == (4, 24, 32)
    assert batch["homography"].shape == (4, 3, 3)
    assert float(jnp.min(batch["image"])) >= -1.0
    assert float(jnp.max(batch["image"])) <= 1.0


def test_pair_warp_consistency():
    """image_aug[p] must equal image[H @ p]: warping the aug coords by H
    recovers source content (the training losses' core assumption,
    KeypointNetwithIOLoss.py:439-442)."""
    rs = np.random.RandomState(0)
    H_img, W_img = 64, 80
    img = rs.rand(1, H_img, W_img, 3).astype(np.float32)
    homo = sample_homography((H_img, W_img), np.random.RandomState(1))
    warped = homography_warp_image(jnp.asarray(img),
                                   jnp.asarray(homo[None]), mode="bilinear")
    # pick interior aug pixels, map via H to source normalized coords
    ys, xs = np.mgrid[20:40:5, 20:60:10]
    pix = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    norm = np.stack([pix[:, 0] / ((W_img - 1) / 2) - 1,
                     pix[:, 1] / ((H_img - 1) / 2) - 1], -1)
    src_norm = np.asarray(warp_coords_homography(
        jnp.asarray(norm[None]), jnp.asarray(homo[None])))[0]
    in_range = np.all(np.abs(src_norm) < 0.95, axis=1)
    from nanovs_slam_tpu.ops.grid_sample import grid_sample_bilinear

    src_vals = np.asarray(grid_sample_bilinear(
        jnp.asarray(img), jnp.asarray(src_norm[None])))[0]
    aug_vals = np.asarray(warped)[0, pix[:, 1].astype(int),
                                  pix[:, 0].astype(int)]
    np.testing.assert_allclose(aug_vals[in_range], src_vals[in_range],
                               atol=0.15)  # bilinear-vs-content tolerance


def test_class_map_luts():
    coco = cocostuff_lut()
    assert coco.shape == (256,) and coco.max() == 27
    city = cityscapes_lut()
    assert city[7] == 0 and city[26] == 13 and city[0] == 255
    mask = np.array([[7, 26], [0, 33]], np.uint8)
    np.testing.assert_array_equal(remap_mask(mask, city),
                                  [[0, 13], [255, 18]])


def test_scale_homography_identity():
    H = np.diag([1.0, 1.0, 1.0])
    out = scale_homography(H, (640, 480), (320, 240), pre=True)
    out = scale_homography(out, (640, 480), (320, 240), pre=False)
    # maps 640x480 frame H=I to 320x240 frame: scale down then up = I
    np.testing.assert_allclose(out, np.diag([1.0, 1.0, 1.0]), atol=1e-9)


def test_depth_pair_batch():
    ds = SyntheticShapesDataset((48, 64), 8, n_classes=5, with_depth=True)
    loader = PairLoader(ds, batch_size=2, im_h=48, im_w=64, d_f=2,
                        train=False, with_depth=True)
    batch = next(iter(loader))
    assert batch["depth"].shape == (2, 24, 32, 1)
    assert batch["depth_aug"].shape == (2, 24, 32, 1)
