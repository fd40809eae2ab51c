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
                   n_hypotheses=256,
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
    """The chunk-loop extract equals the single-dispatch whole-stack
    extract (the pad frames never leak into the output);
    max_single_dispatch=0 forces the loop."""
    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    vo_a = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                     n_hypotheses=256,
                     extract_chunk=2, max_single_dispatch=0)
    vo_b = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                     n_hypotheses=256,
                     extract_chunk=T)
    fa = np.asarray(vo_a.extract(frames))
    fb = np.asarray(vo_b.extract(frames))
    np.testing.assert_allclose(fa, fb, atol=1e-6)


def test_offline_extract_u8_equals_float(setup):
    """uint8 transfer + in-graph /255 normalize equals the float path
    on frames exactly representable in u8 (the transfer-size fast path
    changes WHERE normalization happens, not its math)."""
    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    frames_u8 = np.clip(np.rint(frames * 255.0), 0, 255).astype(np.uint8)
    frames01 = frames_u8.astype(np.float32) / 255.0
    vo = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                   n_hypotheses=256, extract_chunk=T)
    fa = np.asarray(vo.extract(frames_u8))
    fb = np.asarray(vo.extract(frames01))
    np.testing.assert_allclose(fa, fb, atol=1e-5)
    # pose path accepts u8 end-to-end (pose-level EQUALITY between the
    # dtypes is not asserted: with random weights the RANSAC winner is
    # ill-conditioned and ulp-level descriptor diffs can flip it; the
    # corridor quality artifact covers the trained-checkpoint path)
    Ra, ta, ninl, nmat = vo.relative_poses(frames_u8, seed=1)
    assert np.isfinite(Ra).all() and np.isfinite(ta).all()
    np.testing.assert_allclose(np.linalg.norm(ta, axis=1), 1.0,
                               atol=1e-4)
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
                   n_hypotheses=256,
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


def test_bf_match_device_equals_host_matcher():
    """bf_match_device (in-graph, fixed-shape) must produce EXACTLY the
    host ratio_test_match_one_to_one match set (reference
    feature_matcher.py:179-209 semantics) on unmasked descriptors."""
    import jax.numpy as jnp

    from nanovs_slam_tpu.vo.matcher import (bf_match_device,
                                            ratio_test_match_one_to_one)

    rs = np.random.RandomState(4)
    d0 = rs.randn(96, 32).astype(np.float32)
    d1 = rs.randn(80, 32).astype(np.float32)
    # plant 30 strong correspondences so the ratio test passes some
    d1[:30] = d0[:30] + 0.01 * rs.randn(30, 32).astype(np.float32)
    q_host, t_host, _ = ratio_test_match_one_to_one(d0, d1)
    t_dev, valid = bf_match_device(jnp.asarray(d0), jnp.asarray(d1))
    t_dev, valid = np.asarray(t_dev), np.asarray(valid)
    got = {(q, int(t_dev[q])) for q in np.nonzero(valid)[0]}
    want = set(zip(q_host.tolist(), t_host.tolist()))
    assert got == want


def test_bf_match_device_mask_semantics():
    """Padded slots (mask False) must never match, as query or train."""
    import jax.numpy as jnp

    from nanovs_slam_tpu.vo.matcher import bf_match_device

    rs = np.random.RandomState(5)
    d0 = rs.randn(64, 16).astype(np.float32)
    d1 = np.concatenate([d0[:40] + 0.01 * rs.randn(40, 16)
                         .astype(np.float32),
                         rs.randn(24, 16).astype(np.float32)])
    m0 = np.arange(64) < 48
    m1 = np.arange(64) < 40
    t_idx, valid = bf_match_device(jnp.asarray(d0), jnp.asarray(d1),
                                   jnp.asarray(m0), jnp.asarray(m1))
    t_idx, valid = np.asarray(t_idx), np.asarray(valid)
    assert not valid[48:].any()          # masked queries never match
    assert np.all(t_idx[valid] < 40)     # masked trains never matched
    assert valid.sum() >= 30             # planted matches found


@pytest.mark.parametrize("matcher", ["bf", "lightglue"])
def test_offline_vo_sparse_matchers(setup, matcher):
    """Offline VO with the sparse in-graph matchers: shapes, valid
    poses, determinism (VERDICT r3 #4 — offline beyond dense)."""
    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    lightglue = None
    if matcher == "lightglue":
        import jax.numpy as jnp

        from nanovs_slam_tpu.matching.configs import LIGHTGLUE_CONFIGS
        from nanovs_slam_tpu.matching.lightglue import (
            LightGlue, normalize_keypoints)
        import dataclasses
        lg_cfg = dataclasses.replace(LIGHTGLUE_CONFIGS["kp2dtiny_S"],
                                     input_dim=cfg.nfeatures,
                                     descriptor_dim=cfg.nfeatures,
                                     n_layers=2)
        lg_model = LightGlue(lg_cfg)
        rs = np.random.RandomState(0)
        dummy = {
            "keypoints0": jnp.asarray(rs.randn(1, 16, 2), jnp.float32),
            "keypoints1": jnp.asarray(rs.randn(1, 16, 2), jnp.float32),
            "descriptors0": jnp.asarray(
                rs.randn(1, 16, cfg.nfeatures), jnp.float32),
            "descriptors1": jnp.asarray(
                rs.randn(1, 16, cfg.nfeatures), jnp.float32)}
        lg_params = lg_model.init(jax.random.PRNGKey(0), dummy)["params"]
        lightglue = (lg_model, lg_params)
    vo = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                   n_hypotheses=256,
                   extract_chunk=2, matcher=matcher, lightglue=lightglue)
    R, t, ninl, nmat = vo.relative_poses(frames, seed=3)
    assert R.shape == (T - 1, 3, 3) and t.shape == (T - 1, 3)
    for Ri in R:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(Ri) > 0.9
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-4)
    assert (ninl <= nmat).all()
    R2, t2, _, _ = vo.relative_poses(frames, seed=3)
    np.testing.assert_array_equal(R, R2)


def test_offline_vo_sharded_bf(setup):
    """The pair-sharded offline program covers the sparse matchers too
    (VERDICT r3 #4): match counts exactly equal the single-device run."""
    from jax.sharding import Mesh

    from nanovs_slam_tpu.vo.offline import OfflineVO

    cfg, model, variables, cam, frames = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs the forced multi-device CPU mesh")
    vo = OfflineVO(model, cfg, variables, (H, W), cam, k=128,
                   n_hypotheses=256,
                   extract_chunk=T, matcher="bf")
    R0, t0, ninl0, nmat0 = vo.relative_poses(frames, seed=7)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    R1, t1, ninl1, nmat1 = vo.relative_poses_sharded(frames, mesh,
                                                     seed=7)
    np.testing.assert_array_equal(nmat0, nmat1)
    assert np.abs(ninl0.astype(int) - ninl1.astype(int)).max() <= 5
    for Ri in R1:
        np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-4)
