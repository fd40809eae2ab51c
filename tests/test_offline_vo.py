"""Offline sequence VO (vo/offline.py): batched extract + one lax.map
program over pairs (dense match -> unproject -> device RANSAC).

Quality on the trained checkpoint is validated out-of-band (corridor
fixture, STATUS.md: offline 0.0364 vs online fully-device 0.0366 —
same pipeline, restructured); these tests pin the behavioral contract
with random weights: shapes, determinism, chunked-extract equivalence,
and the dense match-budget policy.
"""

import numpy as np
import pytest

import jax

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.vo.camera import PinholeCamera

H, W = 96, 128
T = 5


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("N", n_classes=8)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    variables = {"params": params, "batch_stats": bs}
    cam = PinholeCamera(W, H, 120.0, 120.0, W / 2, H / 2)
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(0)
    base = rs.rand(H // 8 + 6, (W + T * 4) // 8 + 6, 3).astype(np.float32)
    tex = cv2.resize(base, (W + T * 4, H), interpolation=cv2.INTER_CUBIC)
    frames = np.stack([tex[:, 4 * i:4 * i + W] for i in range(T)])
    return cfg, model, variables, cam, np.clip(frames, 0, 1)


def test_offline_vo_shapes_and_determinism(setup):
    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    vo = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                   n_matches=64, extract_chunk=2)
    R, t, ninl, nmat = vo.relative_poses(frames, seed=3)
    assert R.shape == (T - 1, 3, 3) and t.shape == (T - 1, 3)
    assert ninl.shape == (T - 1,) and nmat.shape == (T - 1,)
    assert np.isfinite(R).all() and np.isfinite(t).all()
    # rotations are orthonormal with det +1
    for Ri in R:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(Ri) > 0.9
    # unit translations
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-4)
    # budget respected (threshold never fires on random weights ->
    # top-N fallback), inliers bounded by matches
    assert (nmat <= 64).all() and (nmat > 0).all()
    assert (ninl <= nmat).all()
    # same seed -> bit-identical trajectory
    R2, t2, _, _ = vo.relative_poses(frames, seed=3)
    np.testing.assert_array_equal(R, R2)
    np.testing.assert_array_equal(t, t2)


def test_offline_extract_chunking_invariant(setup):
    """The chunked batched extract equals a whole-stack extract (the pad
    frames never leak into the output)."""
    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    vo_a = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                     extract_chunk=2)
    vo_b = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                     extract_chunk=T)
    fa = np.asarray(vo_a.extract(frames))
    fb = np.asarray(vo_b.extract(frames))
    np.testing.assert_allclose(fa, fb, atol=1e-6)
    assert fa.shape[0] == T


def test_offline_vo_sharded_pairs_match_single_device(setup):
    """relative_poses_sharded over an 8-device mesh: pairs are pure
    data parallelism; global pair indices key the RANSAC sampler on both
    paths, so the hypothesis streams are identical. Final poses can
    still differ where accept-if-better MSAC comparisons tie at float
    ulp (XLA fuses the two programs differently), so the contract tested
    is: identical match sets (pre-RANSAC, deterministic) + equivalent
    pose quality (inlier support within a few counts) + valid poses."""
    from jax.sharding import Mesh

    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs the forced multi-device CPU mesh")
    vo = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                   n_matches=64, extract_chunk=T)
    R0, t0, ninl0, nmat0 = vo.relative_poses(frames, seed=7)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    R1, t1, ninl1, nmat1 = vo.relative_poses_sharded(frames, mesh,
                                                     seed=7)
    np.testing.assert_array_equal(nmat0, nmat1)  # matcher: exact
    assert np.abs(ninl0.astype(int) - ninl1.astype(int)).max() <= 5
    for Ri in R1:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(t1, axis=1), 1.0,
                               atol=1e-4)
