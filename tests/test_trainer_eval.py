"""Trainer-side evaluation fan-out + plateau scheduler (VERDICT r1 #2/#8).

- homography_to_pixel: the pixel point-transfer matrix matches the device
  warp's actual pixel displacement.
- evaluate_model: runs segmentation + keypoints + visloc on synthetic val
  data and returns real metrics for each task.
- PlateauController + inject_hyperparams optimizer: LR drops after a
  stalled metric and the optimizer state picks up the new LR.
"""

import pytest
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
from nanovs_slam_tpu.data.homography import (homography_to_pixel,
                                             homography_warp_image,
                                             sample_homography)
from nanovs_slam_tpu.models.kp2dtiny import build_model
from nanovs_slam_tpu.train.schedules import PlateauController
from nanovs_slam_tpu.train.train_step import (create_train_state,
                                              get_learning_rate,
                                              make_optimizer,
                                              set_learning_rate)

pytestmark = pytest.mark.slow


def test_homography_to_pixel_matches_warp():
    H, W = 64, 96
    rs = np.random.RandomState(3)
    H_norm = sample_homography((H, W), rs)
    H_pix = homography_to_pixel(H_norm, (H, W))

    img = np.zeros((1, H, W, 1), np.float32)
    y0, x0 = 30, 40
    img[0, y0, x0, 0] = 1.0
    warped = np.asarray(homography_warp_image(
        jnp.asarray(img), jnp.asarray(H_norm[None]), mode="nearest"))[0, :, :, 0]
    assert warped.max() > 0.5, "test point warped out of view"
    yw, xw = np.unravel_index(np.argmax(warped), warped.shape)

    p = H_pix @ np.array([x0, y0, 1.0])
    p = p[:2] / p[2]
    assert abs(p[0] - xw) <= 1.5 and abs(p[1] - yw) <= 1.5, (p, (xw, yw))


def test_evaluate_model_fanout_synthetic():
    import sys
    sys.path.insert(0, "/root/repo")
    from train_multitask import evaluate_model, plateau_metric

    H, W = 48, 64
    cfg = get_config("N", n_classes=6)
    model = build_model(cfg)
    tx = make_optimizer("adam", 1e-3)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (1, H, W, 3), tx, with_io=False)
    ds_val = SyntheticShapesDataset((H, W), 4, 6, seed=5)
    args = argparse.Namespace(max_eval_items=3, full_eval=1, top_k=50,
                              dataset_config="datasets.json")
    flags = {"keypoints": True, "segmentation": True, "visloc": True,
             "depth": False}
    results = evaluate_model(model, cfg, state, ds_val, (H, W), args, flags,
                             epoch=0)
    assert "IoU" in results["segmentation"], results["segmentation"]
    assert "repeatability" in results["keypoints"], results["keypoints"]
    assert "recall" in str(results["visloc"]).lower() or \
        any("Recall" in k for k in results["visloc"]), results["visloc"]
    # no real KITTI in this env: the VO eval either falls back to the
    # seeded synthetic fixture (round 3) and reports real error stats,
    # or marks itself skipped when the fixture can't be built.
    assert results["vo"].get("skipped") or "mean" in results["vo"], \
        results["vo"]
    m = plateau_metric(results, [1.0])
    assert np.isfinite(m)

    # epochs not on the full_eval boundary only run the cheap tasks
    args.full_eval = 3
    quick = evaluate_model(model, cfg, state, ds_val, (H, W), args, flags,
                           epoch=0)
    assert "segmentation" in quick and "keypoints" not in quick


def test_plateau_controller_reduces_lr():
    ctl = PlateauController(1e-3, mode="max", factor=0.1, patience=2)
    assert ctl.step(0.5) == 1e-3
    assert ctl.step(0.6) == 1e-3  # improving
    # stall: patience 2 -> reduce on the 3rd bad epoch
    assert ctl.step(0.6) == 1e-3
    assert ctl.step(0.6) == 1e-3
    assert abs(ctl.step(0.6) - 1e-4) < 1e-12


@pytest.mark.slow
def test_plateau_optimizer_injected_lr():
    cfg = get_config("N", n_classes=6)
    model = build_model(cfg)
    tx = make_optimizer("adam", lr=1e-3, plateau=True)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (1, 32, 32, 3), tx, with_io=False)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    state = set_learning_rate(state, 1e-4)
    assert abs(get_learning_rate(state) - 1e-4) < 1e-9

    # the update actually uses the injected LR: a unit gradient step with
    # adam has magnitude ~lr
    grads = jax.tree_util.tree_map(
        jnp.ones_like, {"model": state.params, "io": state.io_params})
    new_state = state.apply_gradients(grads)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params, new_state.params)
    max_step = max(jax.tree_util.tree_leaves(diffs))
    assert 1e-5 < max_step < 2e-4, max_step
