"""Real int8 execution path (VERDICT r1 #5): calibration produces per-conv
scales, the int8 context lowers convs to int8 x int8 -> int32, outputs stay
close to f32, and the lowered graph actually contains integer convolutions.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu import quant
from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.inference import make_infer_fn
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model

pytestmark = pytest.mark.slow


def _setup(H=64, W=96, n_classes=7):
    cfg = get_config("N", n_classes=n_classes)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    var = {"params": params, "batch_stats": bs}
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, H, W, 3).astype(np.float32) * 2 - 1)
    return cfg, model, var, x


def _calibrate(model, var, x):
    def apply_fn(v, batch, mutable):
        return model.apply(v, batch, False, mutable=mutable)
    return quant.calibrate_conv_scales(apply_fn, var, [x], max_batches=1)


def test_calibration_covers_every_conv_block():
    cfg, model, var, x = _setup()
    scales = _calibrate(model, var, x)
    # KP2DTiny-N V2: 8 backbone convs + head convA/convB blocks
    assert len(scales) >= 15, sorted(scales)
    assert all(s > 0 for s in scales.values())
    assert any(k.startswith("backbone/") for k in scales)


def test_int8_outputs_close_to_f32():
    cfg, model, var, x = _setup()
    scales = _calibrate(model, var, x)
    out_f32 = model.apply(var, x, False)
    with quant.int8_execution(scales):
        out_i8 = model.apply(var, x, False)
    a = np.asarray(out_f32["score"], np.float32)
    b = np.asarray(out_i8["score"], np.float32)
    assert not np.allclose(a, b), "int8 path identical to f32 — not active?"
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.02, rel
    feat_rel = (np.abs(np.asarray(out_f32["feat"]) - np.asarray(out_i8["feat"])).mean()
                / (np.abs(np.asarray(out_f32["feat"])).mean() + 1e-9))
    assert feat_rel < 0.15, feat_rel


def test_int8_graph_contains_integer_convolution():
    cfg, model, var, x = _setup()
    scales = _calibrate(model, var, x)
    with quant.int8_execution(scales):
        lowered = jax.jit(
            lambda v, im: model.apply(v, im, False)).lower(var, x)
    hlo = lowered.as_text()
    # StableHLO: int8 tensors lower as ...xi8>; the quantized convs
    # accumulate into i32
    assert hlo.count("xi8>") >= 20, "no int8 tensors in the lowered graph"
    import re
    int_convs = re.findall(r"stablehlo\.convolution.*i32", hlo)
    assert len(int_convs) >= 20, f"only {len(int_convs)} int8 convolutions"
    # and the f32 reference graph has none
    lowered_f32 = jax.jit(
        lambda v, im: model.apply(v, im, False)).lower(var, x)
    assert "xi8>" not in lowered_f32.as_text()


def test_infer_fn_int8_scales_plumbing():
    H, W = 64, 96
    cfg, model, var, x = _setup(H, W)
    scales = _calibrate(model, var, x)
    infer_f32 = make_infer_fn(model, cfg, H, W, use_pallas=False)
    infer_i8 = make_infer_fn(model, cfg, H, W, use_pallas=False,
                             int8_scales=scales)
    a = np.asarray(infer_f32(var, x)["score"])
    b = np.asarray(infer_i8(var, x)["score"])
    assert not np.allclose(a, b)
    assert np.abs(a - b).mean() < 0.02


def test_int8_context_does_not_leak():
    cfg, model, var, x = _setup()
    scales = _calibrate(model, var, x)
    with quant.int8_execution(scales):
        pass
    assert quant.active_int8_scale("backbone/conv1a") is None


def test_int8_chaining_outputs_close_and_int8_pool():
    """Activation chaining (round 3, VERDICT weak #5 follow-up): backbone
    single-consumer edges carry int8 tensors — the lowered graph must
    max-pool an i8 tensor (reduce over i8), and outputs must stay close
    to the unchained int8 path (one extra rounding per chained edge)."""
    cfg, model, var, x = _setup()
    scales = _calibrate(model, var, x)
    with quant.int8_execution(scales):
        out_plain = model.apply(var, x, False)
    with quant.int8_execution(scales, chain=True):
        out_chain = model.apply(var, x, False)
        lowered = jax.jit(
            lambda v, im: model.apply(v, im, False)).lower(var, x)
    hlo = lowered.as_text()
    import re
    # reduce_window prints with a multi-line region; find any whose type
    # signature carries an i8 tensor
    i8_reduce = [m for m in re.findall(
        r"reduce_window[\s\S]{0,2500}?-> tensor<[^>]*xi8>", hlo)]
    assert i8_reduce, "no int8 max-pool found — chaining not active?"
    for k in ("score", "feat"):
        a = np.asarray(out_plain[k], np.float32)
        b = np.asarray(out_chain[k], np.float32)
        rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
        assert rel < 0.05, (k, rel)
