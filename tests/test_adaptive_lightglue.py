"""Host-selected adaptive-depth LightGlue (VERDICT r1 #9).

- full-depth adaptive run == monolithic __call__ matches (same params,
  same assignment head).
- forced shallow exit == the reference semantics: assignment computed by
  the EXIT layer's head, not the last layer's.
- early exit actually triggers on easy (identical-descriptor) problems.
"""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.matching.adaptive import AdaptiveLightGlue
from nanovs_slam_tpu.matching.lightglue import LightGlue, LightGlueConfig


def _make(n_layers=4, dim=32, N=64, seed=0):
    cfg = LightGlueConfig(input_dim=dim, descriptor_dim=dim,
                          n_layers=n_layers, num_heads=4,
                          filter_threshold=0.0, depth_confidence=-1.0)
    model = LightGlue(cfg)
    rs = np.random.RandomState(seed)
    kp0 = rs.uniform(-1, 1, (1, N, 2)).astype(np.float32)
    kp1 = kp0 + rs.randn(1, N, 2).astype(np.float32) * 0.01
    desc = rs.randn(1, N, dim).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    data = {
        "keypoints0": jnp.asarray(kp0), "keypoints1": jnp.asarray(kp1),
        "descriptors0": jnp.asarray(desc),
        "descriptors1": jnp.asarray(desc + rs.randn(1, N, dim).astype(np.float32) * 0.02),
        "mask0": jnp.ones((1, N), bool), "mask1": jnp.ones((1, N), bool),
    }
    params = model.init({"params": jax.random.PRNGKey(1)}, data,
                        True)["params"]
    return model, params, data


@pytest.mark.slow
def test_full_depth_matches_monolithic():
    model, params, data = _make()
    pred_full = model.apply({"params": params}, data)
    alg = AdaptiveLightGlue(model, params, depth_confidence=2.0)  # never stop
    pred_ad = alg(data)
    assert pred_ad["exit_layer"] == model.cfg.n_layers - 1
    np.testing.assert_array_equal(np.asarray(pred_full["matches0"]),
                                  np.asarray(pred_ad["matches0"]))
    # staged jit programs fuse differently than the monolithic one:
    # tolerance covers f32 reassociation noise only
    np.testing.assert_allclose(np.asarray(pred_full["log_assignment"]),
                               np.asarray(pred_ad["log_assignment"]),
                               atol=5e-4)


def test_forced_shallow_exit_uses_exit_assigner():
    model, params, data = _make()
    alg = AdaptiveLightGlue(model, params, depth_confidence=2.0)
    pred1 = alg(data, max_depth=1)
    assert pred1["exit_layer"] == 0
    # manual: embed -> layer0 -> assigner0
    v = {"params": params}
    d0, d1, e0, e1 = model.apply(v, data, method="embed")
    d0, d1 = model.apply(v, 0, d0, d1, e0, e1, data["mask0"], data["mask1"],
                         method="run_layer")
    manual = model.apply(v, 0, d0, d1, data["mask0"], data["mask1"],
                         method="finalize")
    np.testing.assert_allclose(np.asarray(pred1["log_assignment"]),
                               np.asarray(manual["log_assignment"]),
                               atol=5e-4)  # jit-vs-eager f32 noise
    # differs from the LAST layer's head on the same descriptors
    wrong = model.apply(v, model.cfg.n_layers - 1, d0, d1, data["mask0"],
                        data["mask1"], method="finalize")
    assert not np.allclose(np.asarray(manual["log_assignment"]),
                           np.asarray(wrong["log_assignment"]))


def test_early_exit_triggers_and_saves_layers():
    model, params, data = _make()
    # TokenConfidence is random-init; use threshold 0 so ANY ratio stops it
    alg = AdaptiveLightGlue(model, params, depth_confidence=0.0)
    pred = alg(data)
    assert pred["exit_layer"] == 0  # stopped at the first confidence check
    assert pred["matches0"].shape == (1, 64)


def test_early_exit_forward_full_depth_equals_static():
    """In-graph while_loop variant, never-stop confidence: must equal the
    monolithic static forward (same layers, last assigner)."""
    from nanovs_slam_tpu.matching.adaptive import early_exit_forward

    model, params, data = _make()
    pred_full = model.apply({"params": params}, data)
    run = jax.jit(lambda d: early_exit_forward(model, params, d, 2.0))
    pred = run(data)
    assert int(pred["exit_layer"]) == model.cfg.n_layers - 1
    np.testing.assert_array_equal(np.asarray(pred_full["matches0"]),
                                  np.asarray(pred["matches0"]))
    np.testing.assert_allclose(np.asarray(pred_full["log_assignment"]),
                               np.asarray(pred["log_assignment"]),
                               atol=5e-4)


def test_early_exit_forward_matches_host_staged():
    """In-graph and host-staged runners share the ratio computation and
    exit-layer head: same exit layer, same assignment."""
    from nanovs_slam_tpu.matching.adaptive import early_exit_forward

    model, params, data = _make(seed=3)
    for conf in (0.0, 0.5):
        alg = AdaptiveLightGlue(model, params, depth_confidence=conf)
        pred_host = alg(data)
        pred_graph = jax.jit(
            lambda d, c=conf: early_exit_forward(model, params, d, c))(data)
        assert int(pred_graph["exit_layer"]) == pred_host["exit_layer"], conf
        np.testing.assert_allclose(
            np.asarray(pred_host["log_assignment"]),
            np.asarray(pred_graph["log_assignment"]), atol=5e-4)
        np.testing.assert_array_equal(np.asarray(pred_host["matches0"]),
                                      np.asarray(pred_graph["matches0"]))


def test_adaptive_batch_and_masks():
    model, params, data = _make(N=48)
    # invalidate half the keypoints; matches for invalid slots must be -1
    mask = np.ones((1, 48), bool)
    mask[0, 24:] = False
    data = dict(data, mask0=jnp.asarray(mask), mask1=jnp.asarray(mask))
    alg = AdaptiveLightGlue(model, params, depth_confidence=2.0)
    pred = alg(data)
    m0 = np.asarray(pred["matches0"])[0]
    assert (m0[24:] == -1).all()
