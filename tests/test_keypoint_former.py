"""KeypointFormer shape/smoke tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.models.keypoint_former import (KEYPOINTFORMER_CONFIGS,
                                                    KeypointFormer)
from nanovs_slam_tpu.ops.postprocess import post_process


@pytest.mark.slow
def test_keypoint_former_tiny_shapes():
    cfg = KEYPOINTFORMER_CONFIGS["tiny"].__class__(
        **{**KEYPOINTFORMER_CONFIGS["tiny"].__dict__, "n_classes": 7})
    model = KeypointFormer(cfg)
    H, W = 64, 96
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)), False)
    out = model.apply(variables, jnp.zeros((1, H, W, 3)), False)
    Hc, Wc = H // 8, W // 8
    assert out["score"].shape == (1, Hc, Wc, 1)
    assert out["coord"].shape == (1, Hc, Wc, 2)
    assert out["feat"].shape == (1, H // 4, W // 4, cfg.feat_dim)
    assert out["seg"].shape == (1, H // 4, W // 4, 7)
    assert out["vlad"].shape == (1, cfg.num_clusters * cfg.feat_dim)

    post = post_process(out, H, W, cfg.cell)
    assert post["feat"].shape == (1, Hc, Wc, cfg.feat_dim)
    assert float(post["coord"][..., 0].max()) <= W - 1


@pytest.mark.slow
def test_keypoint_former_train_mode():
    cfg = KEYPOINTFORMER_CONFIGS["tiny"]
    model = KeypointFormer(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 32, 32, 3)), True)
    out, mut = model.apply(variables, jnp.ones((2, 32, 32, 3)), True,
                           mutable=["batch_stats"])
    assert "batch_stats" in mut
    assert np.isfinite(float(out["vlad"].sum()))
