"""Shape/smoke tests for all model configs (reference tests.py:1-12 analog,
extended to the full registry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.configs import V2_CONFIGS, V3_CONFIGS, get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.ops.postprocess import post_process


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


_slow = pytest.mark.slow
@pytest.mark.parametrize("name,v3", [
    ("N", False),  # fast default-profile representative
    pytest.param("S_A", False, marks=_slow),
    pytest.param("GEM_N", False, marks=_slow),
    pytest.param("CONVAP_S_A", False, marks=_slow),
    pytest.param("F", False, marks=_slow),
    pytest.param("N_A", True, marks=_slow),
    pytest.param("S", True, marks=_slow)])
def test_forward_shapes(name, v3):
    # NOTE: GeM's PixelUnshuffle(4) requires the feature map divisible by 4
    # (same constraint as the reference, gem.py:14): 96/cell=24 works.
    H, W = 96, 128
    cfg = get_config(name, v3=v3, n_classes=28)
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.zeros((1, H, W, 3)), False)
    cell = cfg.cell
    Hc, Wc = H // cell, W // cell
    assert out["score"].shape == (1, Hc, Wc, 1)
    assert out["coord"].shape == (1, Hc, Wc, 2)
    assert out["feat"].shape == (1, 2 * Hc, 2 * Wc, cfg.nfeatures)
    assert out["seg"].shape == (1, 2 * Hc, 2 * Wc, 28)
    assert out["vlad"].shape == (1, cfg.global_desc_dim)
    # sigmoid/tanh ranges
    assert float(out["score"].min()) >= 0 and float(out["score"].max()) <= 1
    assert float(out["coord"].min()) >= -1 and float(out["coord"].max()) <= 1

    post = post_process(out, H, W, cell)
    assert post["coord"].shape == (1, Hc, Wc, 2)
    assert post["feat"].shape == (1, Hc, Wc, cfg.nfeatures)
    assert post["seg"].shape == (1, 2 * Hc, 2 * Wc, 1)
    assert float(post["coord"][..., 0].max()) <= W - 1
    assert float(post["coord"][..., 1].max()) <= H - 1


@pytest.mark.slow
def test_depth_head():
    cfg = get_config("N", v3=True, n_classes=7, depth=True)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), False)
    assert out["depth"].shape == (1, 32, 32, 1)
    assert float(out["depth"].min()) >= 0 and float(out["depth"].max()) <= 1


def test_param_counts_match_reference_scale():
    """README.md:100-101: KP2Dtiny-N 0.4M, KP2Dtiny-S 0.9M (V3 counts)."""
    for name, v3, lo, hi in [("N", True, 0.3e6, 0.55e6),
                             ("S", True, 0.7e6, 1.1e6)]:
        cfg = get_config(name, v3=v3, n_classes=28)
        params, _ = init_model(build_model(cfg), jax.random.PRNGKey(0),
                               (1, 64, 64, 3))
        n = n_params(params)
        assert lo < n < hi, (name, n)


@pytest.mark.slow
def test_train_mode_runs_with_dropout():
    cfg = get_config("N", n_classes=8)
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((2, 64, 64, 3)), True)
    out, mutated = model.apply(
        variables, jnp.ones((2, 64, 64, 3)), True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert out["score"].shape[0] == 2


def test_registry_complete():
    assert set(V2_CONFIGS) == {"S", "S_A", "N", "N_A", "D", "F", "GEM_N",
                               "GEM_S_A", "CONVAP_S_A"}
    assert set(V3_CONFIGS) == {"S", "S_A", "N", "N_A", "D", "D_A",
                               "CONVAP_S_A"}


def test_mcu_config_convtranspose():
    cfg = get_config("N", n_classes=8, to_mcu=True)
    assert cfg.upscale_method == "convtranspose" and not cfg.leaky_relu
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), False)
    assert out["feat"].shape == (1, 32, 32, cfg.nfeatures)


def test_export_config_dense_vlad():
    cfg = get_config("N", n_classes=8, to_export=True)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.zeros((1, 64, 64, 3)), False)
    assert out["vlad"].ndim == 4  # dense map, aggregation stripped
