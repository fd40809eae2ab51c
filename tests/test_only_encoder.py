"""only_encoder path + NetVLAD k-means init round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.modules.aggregators import NetVLAD


def test_only_encoder_shapes_and_norm():
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 48, 64, 3))
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.ones((1, 48, 64, 3)), False, True)
    Hc, Wc = 48 // cfg.cell, 64 // cfg.cell
    assert out.shape == (1, Hc, Wc, cfg.enc_dim)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_netvlad_init_from_clusters():
    """init_params_from_clusters reproduces the reference vladv1 init math
    (netvlad.py:52-63): alpha from top-2 cluster-dot separation."""
    rs = np.random.RandomState(0)
    K, C = 8, 16
    clsts = rs.randn(K, C).astype(np.float32)
    descs = rs.randn(500, C).astype(np.float32)
    assign_w, centroids = NetVLAD.init_params_from_clusters(clsts, descs)
    assert assign_w.shape == (C, K)
    np.testing.assert_allclose(centroids, clsts)
    # reference formula check
    ca = clsts / np.linalg.norm(clsts, axis=1, keepdims=True)
    dots = np.sort(ca @ descs.T, axis=0)[::-1]
    alpha = -np.log(0.01) / np.mean(dots[0] - dots[1])
    np.testing.assert_allclose(assign_w, (alpha * ca).T, rtol=1e-5)

    # plugged into the module, descriptors near a centroid assign to it
    model = NetVLAD(num_clusters=K, dim=C)
    params = {"assign_w": jnp.asarray(assign_w),
              "centroids": jnp.asarray(centroids)}
    x = jnp.asarray(clsts[0])[None, None, None, :].repeat(4, axis=1)
    out = model.apply({"params": params}, x.repeat(4, axis=2))
    assert out.shape == (1, K * C)


def test_v3_only_encoder():
    cfg = get_config("N", v3=True, n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 48, 64, 3))
    out = model.apply({"params": params, "batch_stats": bs},
                      jnp.ones((1, 48, 64, 3)), False, True)
    assert out.shape[-1] == cfg.enc_dim
