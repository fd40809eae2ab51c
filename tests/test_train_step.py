"""Train-step smoke + loss tests, incl. multi-device data-parallel run on
the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.data.homography import sample_homography
from nanovs_slam_tpu.models.kp2dtiny import build_model
from nanovs_slam_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from nanovs_slam_tpu.train.multitask_loss import LossWeights
from nanovs_slam_tpu.train.train_step import (create_train_state,
                                              make_optimizer, make_train_step)

H, W = 48, 64


def make_batch(B, hs, ws, n_classes, rs=None, depth=False):
    rs = rs or np.random.RandomState(0)
    batch = {
        "image": rs.rand(B, H, W, 3).astype(np.float32) * 2 - 1,
        "image_aug": rs.rand(B, H, W, 3).astype(np.float32) * 2 - 1,
        "seg": rs.randint(0, n_classes, (B, hs, ws)).astype(np.int32),
        "seg_aug": rs.randint(0, n_classes, (B, hs, ws)).astype(np.int32),
        "homography": np.stack([sample_homography((H, W), np.random.RandomState(i))
                                for i in range(B)]).astype(np.float32),
    }
    if depth:
        batch["depth"] = rs.rand(B, hs, ws, 1).astype(np.float32) + 0.1
        batch["depth_aug"] = rs.rand(B, hs, ws, 1).astype(np.float32) + 0.1
    return batch


def _setup(v3=False, depth=False, with_io=True, n_classes=7):
    cfg = get_config("N", v3=v3, n_classes=n_classes, depth=depth)
    model = build_model(cfg)
    tx = make_optimizer("adam", 1e-3)
    state, io_net = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       (2, H, W, 3), tx, with_io=with_io,
                                       io_top_k=64)
    step = make_train_step(model, cfg, H, W, io_net=io_net, io_top_k=64,
                           donate=False)
    return cfg, state, step


def test_train_step_runs_and_descends():
    cfg, state, step = _setup()
    hs = 2 * (H // cfg.cell)
    ws = 2 * (W // cfg.cell)
    batch = make_batch(4, hs, ws, 7)
    weights = LossWeights()
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, weights, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1]), metrics
    assert losses[-1] < losses[0]  # same batch -> loss must drop
    assert int(state.step) == 3


@pytest.mark.slow
def test_train_step_v3_with_depth():
    cfg, state, step = _setup(v3=True, depth=True)
    hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
    batch = make_batch(2, hs, ws, 7, depth=True)
    state, metrics = step(state, batch, LossWeights(depth_loss=1.0),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "depth_loss" in metrics


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    """Batch sharded over 8 virtual devices; same math as single-device."""
    assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
    cfg, state, step = _setup(with_io=False)
    hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
    batch = make_batch(8, hs, ws, 7)

    mesh = make_mesh(8)
    sharded_batch = shard_batch(mesh, batch)
    state_r = replicate(mesh, state)
    state1, m1 = step(state_r, sharded_batch, LossWeights(),
                      jax.random.PRNGKey(0))
    state2, m2 = step(state, batch, LossWeights(), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=2e-4)


@pytest.mark.slow
def test_loss_weights_change_no_recompile():
    cfg, state, step = _setup(with_io=False)
    hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
    batch = make_batch(2, hs, ws, 7)
    state, m1 = step(state, batch, LossWeights(segmentation_loss=2.0),
                     jax.random.PRNGKey(0))
    state, m2 = step(state, batch,
                     LossWeights(segmentation_loss=0.5),
                     jax.random.PRNGKey(0))
    assert float(m1["seg_loss"]) != float(m2["seg_loss"])
