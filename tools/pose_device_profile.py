#!/usr/bin/env python
"""On-chip stage profile of ransac_essential_device (vo/pose.py).

The r4 on-chip artifact showed the full solver at H=8192 x restarts=3
costs ~1.9 s on a v5e — absurd next to the ~ms cv2 host tail it
replaces. This tool times each candidate primitive on the live backend
so the optimization targets measurement, not guesses:

  - batched (H, 8, 9) SVD (the hypothesis null-space solve, XLA svd)
  - batched (H, 9, 9) eigh of A^T A (candidate replacement)
  - batched unrolled-Cholesky inverse iteration (candidate replacement)
  - batched (H, 3, 3) SVD (manifold projection / decomposition)
  - the (H, N) Sampson/MSAC scoring tensor
  - the multi-start GN/IRLS polish phase
  - the full solver at H=8192, restarts=3 / restarts=1

Usage: python tools/pose_device_profile.py [--h 8192] [--n 512]
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=8192)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.utils.profiling import chained_device_time
    from nanovs_slam_tpu.vo.pose import ransac_essential_device

    H, N = args.h, args.n
    rs = np.random.RandomState(0)
    out = {"backend": jax.default_backend(), "H": H, "N": N}

    def row(name, fn, example, n_lo=2, n_hi=12):
        per, _ = chained_device_time(fn, example, n_lo, n_hi)
        out[name] = round(per * 1e3, 4)
        print(json.dumps(out), flush=True)

    # operands
    A = jnp.asarray(rs.randn(H, 8, 9).astype(np.float32))
    E3 = jnp.asarray(rs.randn(H, 3, 3).astype(np.float32))
    M9 = jnp.einsum("hij,hik->hjk", A, A)

    # --- hypothesis solve candidates --------------------------------
    @jax.jit
    def svd_89(a):
        _, _, vt = jnp.linalg.svd(a, full_matrices=True)
        return vt[:, -1, :].sum()

    row("svd_8x9_full_ms", svd_89, A)

    @jax.jit
    def eigh_99(a):
        m = jnp.einsum("hij,hik->hjk", a, a)
        w, v = jnp.linalg.eigh(m)
        return v[:, :, 0].sum()

    row("eigh_9x9_ms", eigh_99, A)

    def chol_solve(M, b):
        """Unrolled batched 9x9 Cholesky solve (M SPD): every op is a
        batched scalar/vector op -> VPU, no XLA linalg loops."""
        n = M.shape[-1]
        L = [[None] * n for _ in range(n)]
        for j in range(n):
            s = M[..., j, j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            for i in range(j + 1, n):
                s = M[..., i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s / L[j][j]
        # forward solve L y = b
        y = [None] * n
        for i in range(n):
            s = b[..., i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # backward solve L^T x = y
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x, -1)

    @jax.jit
    def invit_99(a):
        m = jnp.einsum("hij,hik->hjk", a, a)
        tr = jnp.trace(m, axis1=-2, axis2=-1)[:, None, None]
        m = m + 1e-6 * tr * jnp.eye(9)[None]
        v = jnp.ones((m.shape[0], 9), m.dtype)
        for _ in range(3):
            v = chol_solve(m, v)
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v.sum()

    row("cholesky_invit_9x9_ms", invit_99, A)

    # --- 3x3 SVD (projection + decomposition) ------------------------
    @jax.jit
    def svd_33(e):
        u, s, vt = jnp.linalg.svd(e)
        return (u.sum() + s.sum() + vt.sum())

    row("svd_3x3_ms", svd_33, E3)

    @jax.jit
    def eigh_33(e):
        m = jnp.einsum("hij,hkj->hik", e, e)  # E E^T
        w, v = jnp.linalg.eigh(m)
        return (w.sum() + v.sum())

    row("eigh_3x3_ms", eigh_33, E3)

    # --- Sampson scoring ---------------------------------------------
    pts = jnp.asarray(rs.randn(N, 3).astype(np.float32))

    @jax.jit
    def sampson_score(e):
        Ex0 = jnp.einsum("nk,hjk->hnj", pts, e)
        Etx1 = jnp.einsum("nk,hkj->hnj", pts, e)
        num = jnp.square((pts[None] * Ex0).sum(-1))
        den = (jnp.square(Ex0[..., 0]) + jnp.square(Ex0[..., 1])
               + jnp.square(Etx1[..., 0]) + jnp.square(Etx1[..., 1]))
        d = num / jnp.maximum(den, 1e-12)
        return jnp.minimum(d, 9e-8).sum(-1).min()

    row("sampson_HxN_ms", sampson_score, E3)

    # --- full solver -------------------------------------------------
    if not args.skip_full:
        kpn0 = jnp.asarray(rs.randn(N, 2).astype(np.float32) * 0.2)
        kpn1 = kpn0 * 0.98 + 0.005
        key = jax.random.PRNGKey(0)

        for tag, r in (("full_restarts1_ms", 1), ("full_restarts3_ms", 3)):
            @jax.jit
            def full(a, _r=r):
                b = a * 0.98 + 0.005
                k = jax.random.fold_in(
                    key, (a[0, 0] * 1e6).astype(jnp.int32))
                R, t, inl = ransac_essential_device(
                    a, b, k, n_hypotheses=H, restarts=_r)
                return (R.sum() + t.sum()
                        + inl.astype(jnp.float32).sum())

            row(tag, full, kpn0, 1, 4)

    path = os.path.join(_REPO, "artifacts", "pose_device_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
