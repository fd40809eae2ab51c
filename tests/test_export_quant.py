"""Export + quantization tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.export import (export_stablehlo, load_stablehlo,
                                    make_export_fn)
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.quant import (dequantize_params, fake_quant_params,
                                   quantize_params_int8)

pytestmark = pytest.mark.slow

H, W = 48, 64


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    return cfg, model, {"params": params, "batch_stats": bs}


def test_stablehlo_roundtrip(setup, tmp_path):
    cfg, model, variables = setup
    path = export_stablehlo(model, cfg, variables, H, W,
                            str(tmp_path / "m.stablehlo"))
    assert os.path.getsize(path) > 1000
    exported = load_stablehlo(path)
    x = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32) * 2 - 1
    outs = exported.call(jnp.asarray(x))
    fn = make_export_fn(model, cfg, H, W)
    ref = fn(variables, jnp.asarray(x))
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_int8_quantization(setup):
    cfg, model, variables = setup
    q = quantize_params_int8(variables["params"])
    deq = dequantize_params(q)
    # weight error bounded by one quantization step per channel
    orig = variables["params"]["backbone"]["conv1a"]["conv"]["kernel"]
    rec = deq["backbone"]["conv1a"]["conv"]["kernel"]
    err = np.abs(np.asarray(orig) - rec).max()
    step = np.abs(np.asarray(orig)).max() / 127.0
    assert err <= step + 1e-7

    # fake-quant model still produces sane outputs close to f32
    fq = fake_quant_params(variables["params"])
    x = jnp.asarray(np.random.RandomState(1).rand(1, H, W, 3) * 2 - 1,
                    jnp.float32)
    out32 = model.apply(variables, x, False)
    out8 = model.apply({"params": fq,
                        "batch_stats": variables["batch_stats"]}, x, False)
    cos = np.sum(np.asarray(out32["vlad"]) * np.asarray(out8["vlad"])) / (
        np.linalg.norm(out32["vlad"]) * np.linalg.norm(out8["vlad"]))
    assert cos > 0.98, cos
