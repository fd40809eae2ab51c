"""Golden tests for the fused Pallas kernels (interpret mode on CPU)
against the XLA reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.modules.blocks import l2_normalize
from nanovs_slam_tpu.ops.cell_sample import sample_cell_descriptors_dense
from nanovs_slam_tpu.ops.grid import decode_coords, remove_border
from nanovs_slam_tpu.ops.grid_sample import sample_descriptors
from nanovs_slam_tpu.ops.pallas.netvlad_kernel import netvlad_pallas
from nanovs_slam_tpu.ops.pallas.postprocess_kernel import \
    fused_postprocess_pallas


@pytest.mark.parametrize("H,W,cell", [(96, 128, 4), (64, 128, 8)])
def test_dense_cell_sampling_matches_gather(H, W, cell):
    rs = np.random.RandomState(0)
    Hc, Wc = H // cell, W // cell
    feat = rs.randn(2, 2 * Hc, 2 * Wc, 32).astype(np.float32)
    shift = (rs.rand(2, Hc, Wc, 2).astype(np.float32) * 2 - 1)
    coord = decode_coords(jnp.asarray(shift), H, W, cell)
    ref = sample_descriptors(jnp.asarray(feat), coord, H, W)
    dense = sample_cell_descriptors_dense(jnp.asarray(feat), coord, H, W)
    cos = np.sum(np.asarray(ref) * np.asarray(dense), -1)
    assert cos.min() > 0.99999


@pytest.mark.parametrize("H,W,cell", [(96, 128, 4), (64, 128, 8)])
def test_fused_postprocess_kernel(H, W, cell):
    rs = np.random.RandomState(1)
    B = 2
    Hc, Wc = H // cell, W // cell
    C = 32
    score = rs.rand(B, Hc, Wc, 1).astype(np.float32)
    shift = (rs.rand(B, Hc, Wc, 2).astype(np.float32) * 2 - 1)
    feat = rs.randn(B, 2 * Hc, 2 * Wc, C).astype(np.float32)

    k_score, k_coord, k_desc = fused_postprocess_pallas(
        jnp.asarray(score), jnp.asarray(shift), jnp.asarray(feat),
        H, W, cell, interpret=True)

    ref_score = remove_border(jnp.asarray(score))
    ref_coord = decode_coords(jnp.asarray(shift), H, W, cell)
    ref_desc = sample_descriptors(jnp.asarray(feat), ref_coord, H, W)

    np.testing.assert_allclose(np.asarray(k_score), np.asarray(ref_score),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_coord), np.asarray(ref_coord),
                               atol=1e-4)
    cos = np.sum(np.asarray(k_desc) * np.asarray(ref_desc), -1)
    assert cos.min() > 0.99999, cos.min()


def test_netvlad_kernel_matches_module():
    from nanovs_slam_tpu.modules.aggregators import NetVLAD

    rs = np.random.RandomState(2)
    B, H, W, C, K = 2, 12, 16, 48, 32
    x = rs.randn(B, H, W, C).astype(np.float32)
    mod = NetVLAD(num_clusters=K, dim=C)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    ref = mod.apply({"params": params}, jnp.asarray(x))
    out = netvlad_pallas(jnp.asarray(x), params["assign_w"],
                         params["centroids"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_netvlad_kernel_normalized():
    rs = np.random.RandomState(3)
    x = rs.randn(1, 8, 8, 16).astype(np.float32)
    w = rs.randn(16, 8).astype(np.float32)
    cen = rs.randn(8, 16).astype(np.float32)
    out = np.asarray(netvlad_pallas(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(cen), interpret=True))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
