"""Device-resident dataset cache: batch assembly on device matches the
host PairLoader contract (shapes/ranges/homography semantics)."""

import pytest
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
from nanovs_slam_tpu.data.device_cache import DeviceCachedPairLoader


def test_device_cache_batch_contract():
    H, W, B = 48, 64, 4
    ds = SyntheticShapesDataset((H, W), 10, 6, seed=0)
    loader = DeviceCachedPairLoader(ds, B, H, W, d_f=2, train=True, seed=1)
    assert len(loader) == 2
    assert loader.nbytes() > 0
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (B, H, W, 3)
    assert b["image_aug"].shape == (B, H, W, 3)
    assert b["seg"].shape == (B, H // 2, W // 2)
    assert b["homography"].shape == (B, 3, 3)
    img = np.asarray(b["image"])
    assert img.min() >= -1.0 - 1e-5 and img.max() <= 1.0 + 1e-5
    assert np.asarray(b["seg"]).max() < 6
    # augmented view differs from the clean view (warp applied)
    assert not np.allclose(np.asarray(b["image"]), np.asarray(b["image_aug"]))


def test_device_cache_eval_mode_deterministic():
    H, W = 48, 64
    ds = SyntheticShapesDataset((H, W), 8, 6, seed=0)
    loader = DeviceCachedPairLoader(ds, 4, H, W, d_f=2, train=False, seed=1)
    a = [np.asarray(b["image"]) for b in loader.epoch(0)]
    b = [np.asarray(x["image"]) for x in loader.epoch(0)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_device_cache_trains_one_step():
    import jax

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.train.multitask_loss import LossWeights
    from nanovs_slam_tpu.train.train_step import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step)

    H, W = 48, 64
    cfg = get_config("N", n_classes=6)
    model = build_model(cfg)
    state, io_net = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       (1, H, W, 3), make_optimizer("adam"),
                                       with_io=True, io_top_k=32)
    step = make_train_step(model, cfg, H, W, io_net=io_net, io_top_k=32,
                           donate=False)
    ds = SyntheticShapesDataset((H, W), 4, 6, seed=0)
    loader = DeviceCachedPairLoader(ds, 4, H, W, d_f=2, seed=1)
    batch = next(iter(loader.epoch(0)))
    new_state, metrics = step(state, batch, LossWeights(),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1


def test_device_cache_u8_lossless_equivalence():
    """With a u8-representable dataset, 'auto' stores uint8 planes (4x
    HBM capacity) and every batch equals the forced-f32 loader to input
    1-ulp (the in-graph /255 may fuse differently than host division);
    a float-synthetic dataset must NOT auto-quantize."""
    H, W, B = 48, 64, 4

    class U8Dataset:
        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, i):
            item = dict(self.base[i])
            item["image"] = np.clip(
                np.rint(item["image"] * 255.0), 0, 255) / 255.0
            return item

    ds = U8Dataset(SyntheticShapesDataset((H, W), 8, 6, seed=0))
    lo_u8 = DeviceCachedPairLoader(ds, B, H, W, d_f=2, train=True, seed=1)
    lo_f32 = DeviceCachedPairLoader(ds, B, H, W, d_f=2, train=True, seed=1,
                                    store_u8=False)
    assert lo_u8.store_u8 and not lo_f32.store_u8
    assert lo_u8.images.dtype == jnp.uint8
    assert lo_u8.nbytes() < lo_f32.nbytes() / 3
    for a, b in zip(lo_u8.epoch(0), lo_f32.epoch(0)):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-5)

    # float-valued images (not k/255) stay f32 under "auto"
    lo_auto = DeviceCachedPairLoader(
        SyntheticShapesDataset((H, W), 8, 6, seed=0), B, H, W, seed=1)
    assert lo_auto.images.dtype == jnp.float32 or not lo_auto.store_u8
