"""Torch-mirror parity + ONNX export (utils/torch_mirror.py).

The mirror closes the reference's ONNX export contract
(/root/reference/export_onnx.py:70-79) in an environment with no
jax->ONNX toolchain: a torch twin of the flax architecture, loaded
directly from flax (params, batch_stats), exported with torch's
TorchScript ONNX serializer. These tests pin mirror == flax on random
init for every architectural variant the export CLI exposes, then smoke
the actual .onnx artifact.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.utils.torch_mirror import (build_torch_mirror,
                                                export_onnx)

H, W = 48, 64


def _flax_forward(cfg, params, batch_stats, x_nhwc):
    model = build_model(cfg)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x_nhwc, False)
    return out


def _assert_close(name, torch_nchw, flax_nhwc, atol):
    t = torch_nchw.detach().numpy()
    f = np.asarray(flax_nhwc)
    if f.ndim == 4:
        f = f.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(t, f, atol=atol, rtol=1e-4,
                               err_msg=f"output {name}")


CASES = [
    # (config, v3, depth, to_mcu, to_export)
    ("N", False, False, False, False),     # V2 plain + netvlad
    ("S_A", False, False, False, False),   # V2 SegFormer attention
    ("N", True, True, False, False),       # V3 fused + depth
    ("N", False, False, True, True),       # MCU: convtranspose + ReLU,
                                           # netvlad stripped
    ("GEM_N", False, False, False, False),   # GeM aggregator
    ("CONVAP_S_A", False, False, False, False),  # ConvAP + attention
]


@pytest.mark.parametrize("name,v3,depth,mcu,exp", CASES)
def test_mirror_matches_flax(name, v3, depth, mcu, exp):
    cfg = get_config(name, v3=v3, n_classes=8, to_mcu=mcu, to_export=exp,
                     depth=depth)
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(3),
                                     (1, H, W, 3))
    rs = np.random.RandomState(0)
    x = rs.rand(1, H, W, 3).astype(np.float32) * 2 - 1

    flax_out = _flax_forward(cfg, params, batch_stats, x)
    mirror = build_torch_mirror(cfg, params, batch_stats)
    with torch.no_grad():
        t_out = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    score, coord, feat, vlad, seg = t_out[:5]
    _assert_close("score", score, flax_out["score"], 1e-5)
    _assert_close("coord", coord, flax_out["coord"], 1e-5)
    _assert_close("desc", feat, flax_out["feat"], 1e-4)
    _assert_close("vlad", vlad, flax_out["vlad"], 1e-5)
    _assert_close("seg", seg, flax_out["seg"], 1e-4)
    if depth:
        _assert_close("depth", t_out[5], flax_out["depth"], 1e-5)


def test_onnx_export_artifact(tmp_path):
    """The actual export contract: an opset-16 .onnx file with the
    reference's named outputs, serialized without the onnx package."""
    cfg = get_config("N", n_classes=8)
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    mirror = build_torch_mirror(cfg, params, batch_stats)
    path = str(tmp_path / "KP2Dtiny_N.onnx")
    export_onnx(mirror, path, H, W)
    assert os.path.exists(path)
    raw = open(path, "rb").read()
    # ModelProto sanity: producer + the expected ops and output names
    assert b"pytorch" in raw[:200]
    for tok in (b"Conv", b"Sigmoid", b"Tanh", b"MaxPool", b"Softmax",
                b"image", b"score", b"coord", b"desc", b"vlad", b"seg"):
        assert tok in raw, tok
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(params))
    assert len(raw) > 4 * n_params * 0.9  # weights are embedded


def test_export_cli(tmp_path):
    """export_onnx.py CLI surface (reference export_onnx.py CLI)."""
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "export_onnx.py", "--config", "N",
         "--n_classes", "8", "--im_h", "48", "--im_w", "64",
         "--model_path", str(tmp_path), "--to_mcu", "0",
         "--to_export", "0"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "KP2Dtiny_N.onnx").exists()


def test_keypoint_former_mirror_matches_flax():
    """KeypointFormer mirror == flax (reference export_onnx.py:61 exports
    this third model type; tiny config keeps the test fast)."""
    import dataclasses

    from nanovs_slam_tpu.models.keypoint_former import (
        KEYPOINTFORMER_CONFIGS, KeypointFormer)
    from nanovs_slam_tpu.utils.torch_mirror import \
        build_keypoint_former_mirror

    cfg = dataclasses.replace(KEYPOINTFORMER_CONFIGS["tiny"], n_classes=5)
    model = KeypointFormer(cfg)
    rs = np.random.RandomState(1)
    # the 4-stage pyramid (H/4..H/32) + 2^i re-upsampling needs %32 dims
    x = rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    variables = model.init(jax.random.PRNGKey(4), jnp_asarray(x),
                           train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    flax_out = model.apply({"params": params, "batch_stats": batch_stats},
                           jnp_asarray(x), False)

    mirror = build_keypoint_former_mirror(cfg, params, batch_stats)
    with torch.no_grad():
        score, coord, feat, vlad, seg = mirror(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
    _assert_close("score", score, flax_out["score"], 1e-5)
    _assert_close("coord", coord, flax_out["coord"], 1e-5)
    _assert_close("desc", feat, flax_out["feat"], 1e-4)
    _assert_close("vlad", vlad, flax_out["vlad"], 1e-5)
    _assert_close("seg", seg, flax_out["seg"], 1e-4)


def test_keypoint_former_onnx_cli(tmp_path):
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "export_onnx.py", "--model_type", "KeypointFormer",
         "--config", "tiny", "--n_classes", "5", "--im_h", "64",
         "--im_w", "64", "--model_path", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "KeypointFormer.onnx").exists()


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)
