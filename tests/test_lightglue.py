"""LightGlue tests: functional behavior + torch parity vs the reference
implementation (with an OmegaConf stub since omegaconf isn't installed)."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.matching.lightglue import (LightGlue, LightGlueConfig,
                                                filter_matches,
                                                normalize_keypoints)
from nanovs_slam_tpu.matching.loss import (gt_weights_from_matches,
                                           nll_loss)

torch = pytest.importorskip("torch")


def _make_inputs(B=1, M=24, N=20, C=32, seed=0):
    rs = np.random.RandomState(seed)
    kpts0 = (rs.rand(B, M, 2) * [320, 240]).astype(np.float32)
    kpts1 = (rs.rand(B, N, 2) * [320, 240]).astype(np.float32)
    desc0 = rs.randn(B, M, C).astype(np.float32)
    desc1 = rs.randn(B, N, C).astype(np.float32)
    return kpts0, kpts1, desc0, desc1


def test_normalize_keypoints():
    kpts = np.array([[[0.0, 0.0], [320.0, 240.0]]], np.float32)
    out = np.asarray(normalize_keypoints(jnp.asarray(kpts), (320, 240)))
    np.testing.assert_allclose(out[0, 0], [-1.0, -0.75])
    np.testing.assert_allclose(out[0, 1], [1.0, 0.75])


def test_forward_shapes_and_self_match():
    """Matching a set against itself must produce the identity assignment."""
    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=2,
                          num_heads=4)
    model = LightGlue(cfg)
    kpts0, _, desc0, _ = _make_inputs(M=16, N=16)
    kn = normalize_keypoints(jnp.asarray(kpts0), (320, 240))
    data = {"keypoints0": kn, "keypoints1": kn,
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc0)}
    params = model.init(jax.random.PRNGKey(0), data)["params"]
    pred = model.apply({"params": params}, data)
    assert pred["matches0"].shape == (1, 16)
    assert pred["log_assignment"].shape == (1, 17, 17)
    # identical inputs -> argmax of inner scores should be the diagonal
    inner = np.asarray(pred["log_assignment"])[0, :-1, :-1]
    np.testing.assert_array_equal(inner.argmax(1), np.arange(16))


@pytest.mark.slow
def test_masked_padding_invariance():
    """Padded keypoints must not change the valid keypoints' matches."""
    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=2,
                          num_heads=4)
    model = LightGlue(cfg)
    kpts0, kpts1, desc0, desc1 = _make_inputs(M=16, N=12)
    kn0 = normalize_keypoints(jnp.asarray(kpts0), (320, 240))
    kn1 = normalize_keypoints(jnp.asarray(kpts1), (320, 240))
    data = {"keypoints0": kn0, "keypoints1": kn1,
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc1)}
    params = model.init(jax.random.PRNGKey(0), data)["params"]
    pred = model.apply({"params": params}, data)

    # pad with garbage + masks
    pad = 8
    rs = np.random.RandomState(9)
    data_p = {
        "keypoints0": jnp.concatenate(
            [kn0, jnp.asarray(rs.randn(1, pad, 2), jnp.float32)], 1),
        "keypoints1": jnp.concatenate(
            [kn1, jnp.asarray(rs.randn(1, pad, 2), jnp.float32)], 1),
        "descriptors0": jnp.concatenate(
            [jnp.asarray(desc0), jnp.asarray(rs.randn(1, pad, 32), jnp.float32)], 1),
        "descriptors1": jnp.concatenate(
            [jnp.asarray(desc1), jnp.asarray(rs.randn(1, pad, 32), jnp.float32)], 1),
        "mask0": jnp.asarray(np.r_[np.ones(16), np.zeros(pad)][None] > 0),
        "mask1": jnp.asarray(np.r_[np.ones(12), np.zeros(pad)][None] > 0),
    }
    pred_p = model.apply({"params": params}, data_p)
    np.testing.assert_array_equal(np.asarray(pred["matches0"])[0],
                                  np.asarray(pred_p["matches0"])[0, :16])
    assert np.all(np.asarray(pred_p["matches0"])[0, 16:] == -1)
    np.testing.assert_allclose(np.asarray(pred_p["matching_scores0"])[0, :16],
                               np.asarray(pred["matching_scores0"])[0],
                               atol=1e-4)


def _stub_omegaconf(monkeypatch):
    """The reference imports omegaconf only for config merging."""
    if "omegaconf" in sys.modules:
        return

    class _Conf(dict):
        __getattr__ = dict.__getitem__

    class OmegaConf:
        @staticmethod
        def merge(a, b):
            out = _Conf({**a})
            for k, v in dict(b).items():
                if isinstance(v, dict) and isinstance(out.get(k), dict):
                    out[k] = _Conf({**out[k], **v})
                else:
                    out[k] = v
            for k, v in list(out.items()):
                if isinstance(v, dict) and not isinstance(v, _Conf):
                    out[k] = _Conf(v)
            return out

    mod = types.ModuleType("omegaconf")
    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


@pytest.mark.skipif(not os.path.isdir("/root/reference/lightglue"),
                    reason="reference not available")
@pytest.mark.slow
def test_parity_vs_reference_lightglue(monkeypatch):
    _stub_omegaconf(monkeypatch)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from lightglue.lightglue import LightGlue as TorchLG

    from nanovs_slam_tpu.matching.torch_import import \
        convert_lightglue_state_dict

    conf = {"input_dim": 32, "descriptor_dim": 32, "n_layers": 2,
            "num_heads": 4, "filter_threshold": 0.0}
    torch.manual_seed(0)
    tmodel = TorchLG(conf).eval()
    params = convert_lightglue_state_dict(tmodel.state_dict())

    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=2,
                          num_heads=4, filter_threshold=0.0)
    jmodel = LightGlue(cfg)

    kpts0, kpts1, desc0, desc1 = _make_inputs(M=32, N=28)
    size = (320, 240)
    with torch.no_grad():
        tpred = tmodel({
            "keypoints0": torch.from_numpy(kpts0),
            "keypoints1": torch.from_numpy(kpts1),
            "descriptors0": torch.from_numpy(desc0),
            "descriptors1": torch.from_numpy(desc1),
            "view0": {"image_size": torch.tensor([size], dtype=torch.float32)},
            "view1": {"image_size": torch.tensor([size], dtype=torch.float32)},
        })

    kn0 = normalize_keypoints(jnp.asarray(kpts0), size)
    kn1 = normalize_keypoints(jnp.asarray(kpts1), size)
    jpred = LightGlue(cfg).apply({"params": params}, {
        "keypoints0": kn0, "keypoints1": kn1,
        "descriptors0": jnp.asarray(desc0),
        "descriptors1": jnp.asarray(desc1)})

    np.testing.assert_allclose(np.asarray(jpred["log_assignment"]),
                               tpred["log_assignment"].numpy(), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(jpred["matches0"]),
                                  tpred["matches0"].numpy())
    np.testing.assert_allclose(np.asarray(jpred["matching_scores0"]),
                               tpred["matching_scores0"].numpy(), atol=1e-3)


def test_nll_loss_shapes():
    B, M, N = 2, 10, 8
    rs = np.random.RandomState(0)
    la = jnp.asarray(rs.randn(B, M + 1, N + 1).astype(np.float32))
    gt_assign = np.zeros((B, M, N))
    gt_assign[:, 0, 0] = 1
    gt_m0 = np.full((B, M), -1)
    gt_m0[:, 0] = 0
    gt_m1 = np.full((B, N), -1)
    gt_m1[:, 0] = 0
    w = gt_weights_from_matches(la.shape, jnp.asarray(gt_assign),
                                jnp.asarray(gt_m0), jnp.asarray(gt_m1))
    nll, metrics = nll_loss(la, w)
    assert nll.shape == (B,)
    assert float(metrics["num_matchable"][0]) == 1.0
    assert float(metrics["num_unmatchable"][0]) == (M - 1 + N - 1) / 2.0
