"""Fused whole-network LightGlue Pallas kernel vs the flax reference
implementation (which itself has exact parity with the torch reference,
tests/test_lightglue.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovs_slam_tpu.matching.configs import LIGHTGLUE_CONFIGS
from nanovs_slam_tpu.matching.lightglue import LightGlue
from nanovs_slam_tpu.ops.pallas.lightglue_kernel import FusedLightGlue

pytestmark = pytest.mark.slow

K = 64  # small K so interpret mode stays fast


@pytest.fixture(scope="module")
def setup():
    cfg = LIGHTGLUE_CONFIGS["kp2dtiny_S"]
    matcher = LightGlue(cfg)
    rs = np.random.RandomState(0)
    D = cfg.input_dim
    data = {
        "keypoints0": jnp.asarray(rs.rand(1, K, 2).astype(np.float32) * 2 - 1),
        "keypoints1": jnp.asarray(rs.rand(1, K, 2).astype(np.float32) * 2 - 1),
        "descriptors0": jnp.asarray(rs.randn(1, K, D).astype(np.float32)),
        "descriptors1": jnp.asarray(rs.randn(1, K, D).astype(np.float32)),
    }
    params = matcher.init(jax.random.PRNGKey(1), data)["params"]
    return matcher, params, data


def test_fused_matches_reference(setup):
    matcher, params, data = setup
    want = matcher.apply({"params": params}, data)
    fused = FusedLightGlue(matcher, params, interpret=True)
    got = fused(data)
    np.testing.assert_array_equal(np.asarray(got["matches0"]),
                                  np.asarray(want["matches0"]))
    np.testing.assert_allclose(np.asarray(got["matching_scores0"]),
                               np.asarray(want["matching_scores0"]),
                               atol=1e-4, rtol=1e-3)


def test_fused_with_masks(setup):
    matcher, params, data = setup
    rs = np.random.RandomState(3)
    mask0 = np.ones(K, bool); mask0[40:] = False
    mask1 = np.ones(K, bool); mask1[50:] = False
    d = dict(data, mask0=jnp.asarray(mask0[None]),
             mask1=jnp.asarray(mask1[None]))
    want = matcher.apply({"params": params}, d)
    fused = FusedLightGlue(matcher, params, interpret=True)
    got = fused(d)
    np.testing.assert_array_equal(np.asarray(got["matches0"]),
                                  np.asarray(want["matches0"]))
    # padded slots never match
    assert (np.asarray(got["matches0"])[0, 40:] == -1).all()
    np.testing.assert_allclose(np.asarray(got["matching_scores0"])[0, :40],
                               np.asarray(want["matching_scores0"])[0, :40],
                               atol=1e-4, rtol=1e-3)
