"""Output-fidelity tests vs the reference PyTorch models.

Builds the reference KP2DTiny (random torch init), imports its state_dict
into our flax pytree via utils/torch_import, and checks forward outputs
match (descriptor cosine >= 0.999 is the BASELINE.md north-star; here we
require much tighter elementwise agreement on CPU float32).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model
from nanovs_slam_tpu.ops.postprocess import post_process
from nanovs_slam_tpu.utils.torch_import import convert_state_dict

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not available")]
if REF not in sys.path:
    sys.path.insert(0, REF)


def _build_pair(name, v3, n_classes=13, depth=False, to_mcu=False):
    from kp2dtiny.models.kp2dtiny import KP2DTinyV2, KP2DTinyV3

    cfg = get_config(name, v3=v3, n_classes=n_classes, depth=depth,
                     to_mcu=to_mcu)
    torch.manual_seed(0)
    kw = dict(nClasses=n_classes, nfeatures=cfg.nfeatures,
              channel_dims=list(cfg.channel_dims), downsample=cfg.downsample,
              use_attention=cfg.use_attention, leaky_relu=cfg.leaky_relu,
              num_clusters=cfg.num_clusters, encoder_dim=cfg.encoder_dim,
              global_descriptor_method=cfg.global_descriptor_method,
              upscale_method=cfg.upscale_method, depth=depth)
    tmodel = (KP2DTinyV3(**kw) if v3 else KP2DTinyV2(**kw)).eval()
    params, batch_stats = convert_state_dict(tmodel.state_dict())
    jmodel = build_model(cfg)
    return tmodel, jmodel, {"params": params, "batch_stats": batch_stats}, cfg


def _compare(name, v3, H=64, W=96, depth=False, atol=2e-4):
    tmodel, jmodel, variables, cfg = _build_pair(name, v3, depth=depth)
    rs = np.random.RandomState(42)
    x = rs.rand(2, H, W, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jout = jmodel.apply(variables, jnp.asarray(x), False)

    def t2n(t, nchw=True):
        a = t.numpy()
        return a.transpose(0, 2, 3, 1) if (nchw and a.ndim == 4) else a

    np.testing.assert_allclose(np.asarray(jout["score"]), t2n(tout["score"]),
                               atol=atol, err_msg=f"{name} score")
    np.testing.assert_allclose(np.asarray(jout["coord"]), t2n(tout["coord"]),
                               atol=atol, err_msg=f"{name} shift")
    np.testing.assert_allclose(np.asarray(jout["feat"]), t2n(tout["feat"]),
                               atol=atol * 10, err_msg=f"{name} feat")
    np.testing.assert_allclose(np.asarray(jout["seg"]), t2n(tout["seg"]),
                               atol=atol * 10, err_msg=f"{name} seg")
    np.testing.assert_allclose(np.asarray(jout["vlad"]), t2n(tout["vlad"]),
                               atol=atol, err_msg=f"{name} vlad")
    if depth:
        np.testing.assert_allclose(np.asarray(jout["depth"]),
                                   t2n(tout["depth"]), atol=atol,
                                   err_msg=f"{name} depth")

    # post-processing parity (eval path: coord decode + desc sampling + seg)
    tmodel.training = False
    with torch.no_grad():
        tpost = tmodel.post_processing(
            {k: v.clone() for k, v in tout.items()}, H, W)
    jpost = post_process(jout, H, W, cfg.cell)
    np.testing.assert_allclose(np.asarray(jpost["coord"]),
                               t2n(tpost["coord"]), atol=1e-3,
                               err_msg=f"{name} decoded coords")
    np.testing.assert_allclose(np.asarray(jpost["score"]),
                               t2n(tpost["score"]), atol=atol,
                               err_msg=f"{name} masked score")
    # descriptor cosine similarity — the north-star fidelity metric
    jf = np.asarray(jpost["feat"]).reshape(-1, cfg.nfeatures)
    tf = t2n(tpost["feat"]).reshape(-1, cfg.nfeatures)
    cos = np.sum(jf * tf, -1) / (np.linalg.norm(jf, axis=-1)
                                 * np.linalg.norm(tf, axis=-1) + 1e-12)
    assert cos.min() > 0.999, f"{name} desc cosine {cos.min()}"
    seg_match = (np.asarray(jpost["seg"])[..., 0]
                 == t2n(tpost["seg"])[..., 0]).mean()
    assert seg_match > 0.99, f"{name} seg argmax match {seg_match}"


def test_parity_v2_n():
    _compare("N", v3=False)


def test_parity_v2_s_attention():
    _compare("S_A", v3=False)


def test_parity_v2_gem():
    _compare("GEM_N", v3=False)


def test_parity_v2_convap():
    _compare("CONVAP_S_A", v3=False)


def test_parity_v3_n():
    _compare("N", v3=True)


def test_parity_v3_s_attention():
    _compare("S_A", v3=True)


def test_parity_v3_depth():
    _compare("N", v3=True, depth=True)


def test_parity_v2_f_downsample3():
    _compare("F", v3=False)


def test_parity_v2_mcu_convtranspose():
    """MCU config (convtranspose upsampling + plain ReLU,
    kp2dtiny.py:271-274) must also import with exact output parity."""
    tmodel, jmodel, variables, cfg = _build_pair("N", v3=False, to_mcu=True)
    rs = np.random.RandomState(3)
    x = rs.rand(1, 64, 96, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jout = jmodel.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(jout["feat"]),
        tout["feat"].numpy().transpose(0, 2, 3, 1), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jout["seg"]),
        tout["seg"].numpy().transpose(0, 2, 3, 1), atol=2e-3)
