"""Batched small-matrix primitives that avoid XLA's iterative linalg on TPU.

Motivation (measured on a live v5e, tools/pose_device_profile.py,
artifacts/pose_device_profile.json): XLA lowers jnp.linalg.{svd,eigh}
to iterative algorithms whose TPU cost is catastrophic for large
batches of tiny matrices — svd of an (8192, 8, 9) batch costs 110 ms
and eigh of (8192, 9, 9) costs 111 ms, while the unrolled Cholesky
inverse iteration below computes the same null vectors in 2.0 ms
(55x). Batched (8192, 3, 3) svd costs 36 ms where the closed-form
symmetric eigensolver here is plain elementwise VPU work. These
primitives are what make the device RANSAC pose solver
(vo/pose.ransac_essential_device) viable on TPU at all.

Design rules: static shapes only; the tiny matrix dimension is a
Python-level constant taken from the shape, and every loop over it is
unrolled so each emitted op is a batched elementwise/vector op (VPU) or
a small einsum (MXU) — no lax.linalg, no data-dependent control flow
(jnp.where only). Everything jits, vmaps, and differentiates.

Degenerate inputs (rank-deficient beyond the modeled null space,
near-isotropic spectra) return FINITE orthonormal garbage rather than
NaN: in the RANSAC setting such hypotheses must lose the MSAC argmax,
not poison downstream argmin/where logic.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cholesky_factor", "cholesky_solve_factored", "cholesky_solve",
           "nullvec", "eigh3", "svd3"]


def cholesky_factor(M):
    """Batched Cholesky factor of SPD M (..., n, n) -> lower L.

    Right-looking form, unrolled over the (static, tiny) n but
    VECTORIZED per column: each of the n steps is a handful of batched
    vector ops (a rank-1 update, a scaled column write), so the emitted
    HLO is O(n^2) ops — the fully scalar-unrolled version's O(n^3)
    graph took XLA:CPU ~90 s to compile through the RANSAC solver's
    vmaps. The sqrt argument is floored so PSD-but-singular inputs
    yield finite output.
    """
    n = M.shape[-1]
    dt = M.dtype
    S = M
    cols = []
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(S[..., j, j], 1e-30))
        col = S[..., :, j] / d[..., None]
        # rows < j belong to previous columns; mask them to zero
        col = col * (jnp.arange(n) >= j).astype(dt)
        cols.append(col)
        S = S - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, -1)  # (..., n, n) lower-triangular


def cholesky_solve_factored(L, b):
    """Solve L L^T x = b for batched lower-triangular L (..., n, n) and
    b (..., n), substitutions unrolled-but-vectorized per column."""
    n = L.shape[-1]
    dt = L.dtype
    y = b
    for j in range(n):
        yj = y[..., j] / L[..., j, j]
        below = (jnp.arange(n) > j).astype(dt)
        y = y - yj[..., None] * (L[..., :, j] * below)
        y = y.at[..., j].set(yj)
    x = y
    for j in reversed(range(n)):
        xj = x[..., j] / L[..., j, j]
        above = (jnp.arange(n) < j).astype(dt)
        x = x - xj[..., None] * (L[..., j, :] * above)
        x = x.at[..., j].set(xj)
    return x


def cholesky_solve(M, b):
    """Batched SPD solve x = M^-1 b via the vectorized unrolled
    Cholesky; M (..., n, n), b (..., n)."""
    return cholesky_solve_factored(cholesky_factor(M), b)


# fixed pseudo-random start for the inverse iteration: a generic
# direction (no symmetry with epipolar-constraint null spaces), so the
# overlap with the target eigenvector is O(1) for real inputs
_START = (0.31, -0.47, 0.22, 0.55, -0.18, 0.40, -0.29, 0.36, 0.51,
          -0.24, 0.44, -0.38)


def nullvec(A, iters: int = 4, shift: float = 1e-6):
    """Unit vector minimizing ||A v|| for batched A: (..., m, n) -> (..., n).

    The smallest-right-singular-vector of A, computed WITHOUT svd/eigh:
    inverse iteration on the normal matrix A^T A + shift*tr*I using the
    unrolled Cholesky solve. For RANSAC minimal solves (m = n - 1, A^T A
    exactly rank-deficient) one iteration already converges; `iters`
    defaults to 4 to also cover least-squares refits (m >> n) where the
    smallest eigenvalue is noise-positive. Replaces
    jnp.linalg.svd(A, full_matrices=True)[2][..., -1, :] at ~55x less
    TPU cost for large batches (module docstring).
    """
    n = A.shape[-1]
    M = jnp.einsum("...ij,...ik->...jk", A, A)
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    Ms = M + (shift * tr + 1e-30) * jnp.eye(n, dtype=A.dtype)
    L = cholesky_factor(Ms)  # factor ONCE, solve per iteration
    v = jnp.broadcast_to(jnp.asarray(_START[:n], A.dtype), M.shape[:-1])
    for _ in range(iters):
        v = cholesky_solve_factored(L, v)
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _robust_eigvec3(M, lam):
    """Batched eigenvector of symmetric (..., 3, 3) M for eigenvalue
    lam (...,): the largest-norm cross product of two rows of M - lam*I
    (the classic robust construction). Near-isotropic rows give a unit
    fallback instead of NaN."""
    C = M - lam[..., None, None] * jnp.eye(3, dtype=M.dtype)
    r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    cands = jnp.stack([jnp.cross(r0, r1), jnp.cross(r0, r2),
                       jnp.cross(r1, r2)], axis=-2)          # (..., 3, 3)
    nrm = jnp.linalg.norm(cands, axis=-1)                    # (..., 3)
    best = jnp.argmax(nrm, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                            axis=-2)[..., 0, :]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.asarray((0.0, 0.0, 1.0), M.dtype), v.shape)
    return jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), fallback)


def _tangent_pair(u):
    """Two unit vectors completing batched unit u (..., 3) to an
    orthonormal frame (branchless axis pick)."""
    ex = jnp.broadcast_to(jnp.asarray((1.0, 0.0, 0.0), u.dtype), u.shape)
    ey = jnp.broadcast_to(jnp.asarray((0.0, 1.0, 0.0), u.dtype), u.shape)
    a = jnp.where(jnp.abs(u[..., :1]) < 0.9, ex, ey)
    b1 = jnp.cross(u, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True),
                          1e-30)
    return b1, jnp.cross(u, b1)


def eigh3(M):
    """Closed-form eigendecomposition of batched symmetric (..., 3, 3).

    Returns (w, U): eigenvalues w (..., 3) DESCENDING and orthonormal
    eigenvector columns U (..., 3, 3). Eigenvalues are the Cardano
    trigonometric roots of the characteristic cubic; the eigenvector for
    the (well-separated, in the intended rank-2 uses) smallest
    eigenvalue comes from the robust cross-product construction and the
    top pair from an exact 2x2 rotation inside its orthogonal
    complement — stable under a degenerate top pair (any basis of the
    eigenspace is returned, which is exactly the invariance the
    essential-matrix uses need). Pure elementwise ops; no lax.linalg.
    """
    q = jnp.trace(M, axis1=-2, axis2=-1) / 3.0
    Mq = M - q[..., None, None] * jnp.eye(3, dtype=M.dtype)
    p = jnp.sqrt(jnp.maximum(
        (Mq * Mq).sum(axis=(-2, -1)) / 6.0, 1e-30))
    B = Mq / p[..., None, None]
    detB = (B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2]
                            - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2]
                              - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1]
                              - B[..., 1, 1] * B[..., 2, 0]))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    w0 = q + 2.0 * p * jnp.cos(phi)
    w2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    w1 = 3.0 * q - w0 - w2

    u2 = _robust_eigvec3(M, w2)
    b1, b2 = _tangent_pair(u2)
    Mb1 = jnp.einsum("...ij,...j->...i", M, b1)
    Mb2 = jnp.einsum("...ij,...j->...i", M, b2)
    c00 = (b1 * Mb1).sum(-1)
    c01 = (b1 * Mb2).sum(-1)
    c11 = (b2 * Mb2).sum(-1)
    ang = 0.5 * jnp.arctan2(2.0 * c01, c00 - c11)
    c, s = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    ua = c * b1 + s * b2
    ub = -s * b1 + c * b2
    # order the top pair descending by Rayleigh quotient
    ra = (ua * jnp.einsum("...ij,...j->...i", M, ua)).sum(-1)
    rb = (ub * jnp.einsum("...ij,...j->...i", M, ub)).sum(-1)
    swap = (rb > ra)[..., None]
    u0 = jnp.where(swap, ub, ua)
    u1 = jnp.where(swap, ua, ub)
    U = jnp.stack([u0, u1, u2], axis=-1)
    w = jnp.stack([jnp.maximum(w0, w1), jnp.minimum(w0, w1), w2], -1)
    return w, U


def svd3(E):
    """Closed-form SVD of batched (..., 3, 3), built for essential-matrix
    work: U from eigh3 of E E^T, right vectors derived as
    v_i = E^T u_i / s_i with a Gram-Schmidt touch-up (exact when the
    singular values are distinct; under an equal top pair — every true
    essential matrix — any rotation of the pair is valid and the
    construction stays orthonormal), v2 = v0 x v1. Returns
    (U (..., 3, 3) columns, s (..., 3) descending >= 0, V (..., 3, 3)
    columns). NOTE v2's sign is a convention (s2 is reported as a
    magnitude): uses that discard the smallest singular component —
    manifold projection, the 4-way (R, t) decomposition candidate set —
    are invariant to it, which is the intended scope.
    """
    M = jnp.einsum("...ij,...kj->...ik", E, E)  # E E^T
    w, U = eigh3(M)
    u0, u1, u2 = U[..., 0], U[..., 1], U[..., 2]
    w0 = jnp.einsum("...ji,...j->...i", E, u0)  # E^T u0
    s0 = jnp.linalg.norm(w0, axis=-1)
    v0 = w0 / jnp.maximum(s0[..., None], 1e-30)
    w1 = jnp.einsum("...ji,...j->...i", E, u1)
    s1 = jnp.linalg.norm(w1, axis=-1)
    w1 = w1 - (w1 * v0).sum(-1, keepdims=True) * v0
    n1 = jnp.linalg.norm(w1, axis=-1, keepdims=True)
    t1, _ = _tangent_pair(v0)
    v1 = jnp.where(n1 > 1e-20, w1 / jnp.maximum(n1, 1e-30), t1)
    v2 = jnp.cross(v0, v1)
    s2 = jnp.abs(jnp.einsum("...i,...ij,...j->...", u2, E, v2))
    V = jnp.stack([v0, v1, v2], axis=-1)
    s = jnp.stack([s0, s1, s2], axis=-1)
    return U, s, V
