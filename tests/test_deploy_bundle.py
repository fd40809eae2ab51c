"""MCU deployment bundle (.nvsb): the ExecuTorch-path analog
(reference quantize.py:18-56 -> model.pte + ExecuTorch C++ runtime).

Parity chain pinned here: JAX int8_execution forward == numpy bundle
interpreter == native C runtime, on the MCU-export graph
(to_mcu: convtranspose upsample + plain ReLU; heads score/loc/desc).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nanovs_slam_tpu import deploy, quant
from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    H, W = 48, 64
    cfg = get_config("S", n_classes=7, to_mcu=True, to_export=True)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    var = {"params": params, "batch_stats": bs}
    rs = np.random.RandomState(3)
    img = rs.rand(H, W, 3).astype(np.float32)

    def apply_fn(v, batch, mutable):
        return model.apply(v, batch, False, mutable=mutable,
                           heads=("score", "loc", "desc"))

    scales = quant.calibrate_conv_scales(apply_fn, var, [img[None]],
                                         max_batches=1)
    with quant.int8_execution(scales):
        ref = model.apply(var, jnp.asarray(img[None]), False,
                          heads=("score", "loc", "desc"))
    ref = {k: np.asarray(v, np.float32)[0] for k, v in ref.items()}

    path = str(tmp_path_factory.mktemp("bundle") / "model.nvsb")
    deploy.export_mcu_bundle(params, bs, cfg, path, scales=scales)
    return cfg, model, var, img, scales, ref, path


def _assert_close(got, ref):
    assert set(got) == {"score", "coord", "feat"}
    for k in ("score", "coord", "feat"):
        g, r = got[k], ref["score" if k == "score" else
                          ("coord" if k == "coord" else "feat")]
        assert g.shape == r.shape, (k, g.shape, r.shape)
        scale = np.abs(r).mean() + 1e-6
        err = np.abs(g - r).max()
        assert err / scale < 2e-2, (k, err, scale)
        # and tight on the typical value
        assert np.abs(g - r).mean() / scale < 2e-3, k


def test_numpy_interpreter_matches_jax_int8(setup):
    cfg, model, var, img, scales, ref, path = setup
    got = deploy.run_bundle_numpy(path, img)
    _assert_close(got, ref)


def test_c_runtime_matches_numpy_exactly_and_jax(setup):
    if not deploy.c_runtime_available():
        pytest.skip("no C toolchain")
    cfg, model, var, img, scales, ref, path = setup
    got_c = deploy.run_bundle_c(path, img)
    got_np = deploy.run_bundle_numpy(path, img)
    _assert_close(got_c, ref)
    # C and numpy implement identical arithmetic on identical blobs; only
    # f32 summation order differs.
    for k in got_np:
        assert np.abs(got_c[k] - got_np[k]).max() < 1e-4, k


def test_f32_bundle_without_calibration(setup):
    cfg, model, var, img, scales, ref, path = setup
    # no scales -> every ConvBNAct stays f32 (convbn ops); parity vs the
    # plain f32 forward instead of the int8 one
    p2 = path + ".f32"
    deploy.export_mcu_bundle(var["params"], var["batch_stats"], cfg, p2,
                             scales=None)
    out_f32 = model.apply(var, jnp.asarray(img[None]), False,
                          heads=("score", "loc", "desc"))
    ref_f32 = {k: np.asarray(v, np.float32)[0] for k, v in out_f32.items()}
    got = deploy.run_bundle_numpy(p2, img)
    for k_out, k_ref in (("score", "score"), ("coord", "coord"),
                         ("feat", "feat")):
        err = np.abs(got[k_out] - ref_f32[k_ref]).max()
        assert err < 1e-4, (k_out, err)
    with open(p2, "rb") as f:
        head = f.read().split(b"\nDATA\n")[0].decode()
    assert "conv8" not in head and "convbn" in head


def test_bundle_is_int8_sized(setup):
    cfg, model, var, img, scales, ref, path = setup
    # int8 bundle must be well under half the f32 param footprint: the
    # 10 ConvBNAct kernels dominate and are stored as int8
    f32_bytes = sum(np.asarray(l).nbytes
                    for l in jax.tree_util.tree_leaves(var["params"]))
    # only the score/loc/desc subgraph is bundled; compare against that
    sub = {k: v for k, v in var["params"].items()
           if k in ("backbone", "score_head", "loc_head", "desc_head")}
    sub_bytes = sum(np.asarray(l).nbytes
                    for l in jax.tree_util.tree_leaves(sub))
    assert os.path.getsize(path) < 0.55 * sub_bytes, (
        os.path.getsize(path), sub_bytes, f32_bytes)


def test_pixelshuffle_config_rejected(setup):
    cfg, model, var, img, scales, ref, path = setup
    bad = get_config("S", n_classes=7)  # training config: pixelshuffle
    with pytest.raises(ValueError, match="convtranspose"):
        deploy.export_mcu_bundle(var["params"], var["batch_stats"], bad,
                                 path + ".bad")
