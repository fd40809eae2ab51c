"""ops/smallmat: the TPU-native batched small-matrix primitives that
replace XLA's iterative svd/eigh in the device RANSAC pose solver
(measured 55x cheaper on a v5e for the (8192, 8, 9) null-space solve —
artifacts/pose_device_profile.json)."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.ops.smallmat import cholesky_solve, eigh3, nullvec, svd3


def test_cholesky_solve_matches_linalg():
    rs = np.random.RandomState(0)
    for n in (5, 9):
        A = rs.randn(64, n, n).astype(np.float32)
        M = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32)
        b = rs.randn(64, n).astype(np.float32)
        x = np.asarray(jax.jit(cholesky_solve)(M, b))
        x_ref = np.linalg.solve(M, b[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


def test_nullvec_matches_svd_minimal_and_lsq():
    rs = np.random.RandomState(1)
    # minimal 8x9 systems: exact one-dim null space (the RANSAC
    # hypothesis solve) — vector must match svd's null vector
    A = rs.randn(128, 8, 9).astype(np.float32)
    v = np.asarray(jax.jit(nullvec)(A))
    v_ref = np.linalg.svd(A)[2][:, -1, :]
    cos = np.abs((v * v_ref).sum(-1))
    assert cos.min() > 0.999, cos.min()
    r = np.linalg.norm(np.einsum("bij,bj->bi", A, v), axis=-1)
    assert r.max() < 1e-5, r.max()

    # least-squares refits with a SEPARATED small eigenvalue (an
    # inlier-weighted epipolar system whose model fits: residual
    # singular value ~1e-2 of the rest — the solver's refit regime)
    u_q = np.linalg.qr(rs.randn(128, 64, 9).astype(np.float32))[0]
    v_q = np.linalg.qr(rs.randn(128, 9, 9).astype(np.float32))[0]
    s_sep = np.linspace(3.0, 1.0, 9).astype(np.float32)
    s_sep[-1] = 0.02
    A2 = u_q * s_sep[None, None, :] @ v_q.transpose(0, 2, 1)
    v2 = np.asarray(jax.jit(nullvec)(A2))
    v2_ref = np.linalg.svd(A2)[2][:, -1, :]
    assert np.abs((v2 * v2_ref).sum(-1)).min() > 0.999

    # unseparated spectra (pure-noise refit): the CONTRACT degrades to
    # objective near-optimality, never NaN
    A3 = rs.randn(128, 64, 9).astype(np.float32)
    v3 = np.asarray(jax.jit(nullvec)(A3))
    assert np.isfinite(v3).all()
    r3 = np.linalg.norm(np.einsum("bij,bj->bi", A3, v3), axis=-1)
    s3_min = np.linalg.svd(A3, compute_uv=False)[:, -1]
    assert (r3 / s3_min).max() < 1.5, (r3 / s3_min).max()


def test_eigh3_descending_orthonormal():
    rs = np.random.RandomState(2)
    A = rs.randn(256, 3, 3).astype(np.float32)
    M = A @ A.transpose(0, 2, 1)
    w, U = jax.jit(eigh3)(M)
    w, U = np.asarray(w), np.asarray(U)
    w_ref = np.linalg.eigvalsh(M)[:, ::-1]
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-3)
    eye = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(U.transpose(0, 2, 1) @ U, eye[None]
                               .repeat(256, 0), atol=1e-4)
    # eigen equation, column-wise
    err = np.linalg.norm(M @ U - U * w[:, None, :], axis=1)
    assert (err / np.abs(w_ref[:, :1])).max() < 5e-3


def test_svd3_reconstructs_and_projection_invariant():
    rs = np.random.RandomState(3)
    E = rs.randn(256, 3, 3).astype(np.float32)
    U, s, V = jax.jit(svd3)(E)
    U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
    # orthonormal factors, descending singular values
    eye = np.eye(3, dtype=np.float32)[None].repeat(256, 0)
    np.testing.assert_allclose(U.transpose(0, 2, 1) @ U, eye, atol=1e-4)
    np.testing.assert_allclose(V.transpose(0, 2, 1) @ V, eye, atol=1e-4)
    assert (s[:, 0] >= s[:, 1] - 1e-5).all()
    s_ref = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(s[:, :2], s_ref[:, :2], rtol=1e-3,
                               atol=1e-3)
    # essential-manifold projection (the use case) equals the svd-based
    # projection: sbar * (u0 v0^T + u1 v1^T)
    sbar = 0.5 * (s[:, 0] + s[:, 1])
    P = sbar[:, None, None] * (
        U[..., :1] @ V[..., :1].transpose(0, 2, 1)
        + U[..., 1:2] @ V[..., 1:2].transpose(0, 2, 1))
    u_r, s_r, vt_r = np.linalg.svd(E)
    sb_r = 0.5 * (s_r[:, 0] + s_r[:, 1])
    P_ref = (u_r[..., :2] * np.stack([sb_r, sb_r], -1)[:, None, :]
             ) @ vt_r[:, :2, :]
    np.testing.assert_allclose(P, P_ref, atol=2e-3)


def test_svd3_decomposition_candidates_on_essential():
    """On true essential matrices (equal top pair, zero third singular
    value) the 4-way (R, t) candidate set built from svd3's factors must
    match the one from numpy's svd — possibly with the Ra/Rb roles
    swapped (v2's sign convention)."""
    rs = np.random.RandomState(4)
    W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)

    def cands(u, vt):
        d = np.sign(np.linalg.det(u @ vt))
        return {tuple(np.round((u @ w @ vt * d).ravel(), 4))
                for w in (W, W.T)}, np.abs(u[:, 2])

    for _ in range(20):
        t = rs.randn(3).astype(np.float32)
        t /= np.linalg.norm(t)
        w_rot = rs.randn(3) * 0.3
        th = np.linalg.norm(w_rot)
        K = np.array([[0, -w_rot[2], w_rot[1]], [w_rot[2], 0, -w_rot[0]],
                      [-w_rot[1], w_rot[0], 0]]) / th
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E = (Tx @ R).astype(np.float32)

        U, s, V = svd3(E[None])
        u, vt = np.asarray(U)[0], np.asarray(V)[0].T
        set_ours, t_ours = cands(u, vt)
        u_r, _, vt_r = np.linalg.svd(E)
        set_ref, t_ref = cands(u_r, vt_r)
        assert set_ours == set_ref
        np.testing.assert_allclose(t_ours, t_ref, atol=1e-3)
