"""Pose estimation + error metrics for VO.

Behavioral contract:
- estimate_pose (reference evaluation/visual_odometry.py:139-162):
  undistort -> unproject -> cv2.findEssentialMat (USAC_MSAC, prob .999,
  threshold 3e-4, focal 1, pp (0,0)) -> cv2.recoverPose.
- calculate_pose_error (src/visual_odometry/utils.py:5-19): t = L2 diff,
  r = ||Rodrigues(R_est @ R_gt^T)||.
- calculate_relative_error (evaluation/visual_odometry.py:165-176): apply
  the estimated relative (R, t) with GT scale to the previous GT pose and
  compare to the current GT pose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def estimate_pose(kps_ref: np.ndarray, kps_cur: np.ndarray, cam):
    import cv2

    kp_ref_u = cam.undistort_points(kps_ref)
    kp_cur_u = cam.undistort_points(kps_cur)
    kpn_ref = cam.unproject_points(kp_ref_u)
    kpn_cur = cam.unproject_points(kp_cur_u)
    method = getattr(cv2, "USAC_MSAC", cv2.RANSAC)
    E, mask_match = cv2.findEssentialMat(
        kpn_cur, kpn_ref, focal=1, pp=(0.0, 0.0), method=method,
        prob=0.999, threshold=0.0003)
    _, R, t, mask = cv2.recoverPose(E, kpn_cur, kpn_ref, focal=1,
                                    pp=(0.0, 0.0))
    return R, t, mask_match, mask


def calculate_pose_error(R_gt: np.ndarray, t_gt: np.ndarray,
                         R_est: np.ndarray, t_est: np.ndarray
                         ) -> Tuple[float, float]:
    import cv2

    t_error = float(np.sqrt(((t_est - t_gt) ** 2).sum()))
    r, _ = cv2.Rodrigues(R_est.dot(R_gt.T))
    r_error = float(np.linalg.norm(r))
    return t_error, r_error


def calculate_relative_error(gt, i_frame: int, R: np.ndarray, t: np.ndarray
                             ) -> Tuple[float, float]:
    _, _, _, absolute_scale = gt.get_pose_and_absolute_scale(i_frame - 1)
    t_last, rot_last = gt.extract_pose_values(i_frame - 1)
    est_t = t_last + absolute_scale * rot_last.dot(t).T
    est_R = rot_last.dot(R)
    t_curr, R_curr = gt.extract_pose_values(i_frame)
    return calculate_pose_error(R_curr, t_curr, est_R, est_t[0]
                                if est_t.ndim > 1 else est_t)


def calculate_error_stats(errors: np.ndarray) -> Dict[str, float]:
    return {"mean": float(errors.mean()), "sum": float(errors.sum()),
            "std": float(errors.std()), "max": float(errors.max()),
            "min": float(errors.min())}


def assemble_vo_error_stats(t_errs, r_errs) -> Dict:
    """Per-pair error lists -> the reference's verbose stats layout
    (evaluation/visual_odometry.py:318-332): the FIRST pair is dropped
    (the reference's loop warm-up) and translation/rotation/total each
    get mean/sum/std/max/min. Shared by the online and offline eval
    paths so the error-math contract lives in one place."""
    t = np.asarray(t_errs[1:], float)
    r = np.asarray(r_errs[1:], float)
    return {"translation": calculate_error_stats(t),
            "rotation": calculate_error_stats(r),
            "total": calculate_error_stats(t + r)}


def ransac_essential_device(kpn_ref, kpn_cur, key, valid=None,
                            n_hypotheses: int = 8192,
                            threshold: float = 3e-4,
                            lo_rounds: int = 2,
                            pool: int = 4,
                            restarts: int = 3,
                            lo_hypotheses: int | None = None):
    """Device-resident robust essential-matrix pose: the TPU-native
    counterpart of the host tail `cv2.findEssentialMat(USAC_MSAC,
    threshold 3e-4) + cv2.recoverPose` (estimate_pose above; reference
    evaluation/visual_odometry.py:139-162). The whole estimator is one
    XLA program — no per-hypothesis host loop:

    - sample n_hypotheses 8-point minimal subsets (one jax.random call),
    - solve all hypotheses' null spaces with ONE batched Cholesky
      inverse iteration (ops/smallmat.nullvec — round 4: replacing the
      batched (H, 8, 9) jnp.linalg.svd, whose iterative TPU lowering
      cost 110 ms/call at H=8192 and made the full solver 1.9 s on a
      v5e; the measured swap is 55x on the null solve and takes the
      full restarts=3 solver to 42 ms — tools/pose_device_profile.py,
      artifacts/pose_device_profile.json),
    - project all candidate E onto the essential manifold (closed-form
      batched svd3, same module — the (8192, 3, 3) jnp.linalg.svd it
      replaces cost 36 ms/call),
    - MSAC-score every hypothesis against every correspondence in one
      (H, N) Sampson-distance tensor (the N-sized products are plain
      batched matmuls -> MXU),
    - LO-RANSAC local optimization: two rounds of fresh minimal samples
      drawn INSIDE the winner's inlier support + an inlier-weighted DLT
      refit, every candidate accept-if-better on the full MSAC score,
    - decompose + masked cheirality vote (only inliers vote).

    kpn_ref/kpn_cur: (N, 2) NORMALIZED image-plane correspondences, same
    operand convention as estimate_pose. valid: optional (N,) bool mask
    for padded slots. Returns (R (3,3), t (3,1) unit, inlier_mask (N,)
    bool) with the cv2 (R, t) convention.

    Degeneracy note: hypotheses whose 8 sampled rows are rank-deficient
    simply score badly and lose the argmax — no data-dependent control
    flow, so the function jits and vmaps.

    Measured vs cv2 USAC_MSAC on corridor-fixture BF match populations
    (tools/pose_tail_probe.py, 29 pairs, GT poses; cv2 is deterministic
    at t-dir mean/median 9.26/8.09 deg). Round-4 progression of this
    solver on the same populations: baseline H=2048 single-start
    14.95/9.52 -> H=8192 9.64/7.00 -> + multi-start pool polish +
    Cauchy-IRLS phase 9.86 +- 0.9 mean / 7.70 median over 3 RANSAC key
    seeds — the MEDIAN beats cv2; the 3-seed mean sits ~0.6 deg above
    with the residual being key variance on 2-3 hard low-parallax
    pairs, not a systematic bias. Inlier support 80-82 vs cv2-era 77.8.
    Negative results, measured: x64 (not float precision),
    Sampson-reweighted and threshold-annealed refits (lose support),
    lo_rounds=3/4 (no mean gain, more seed spread), multi-start alone
    at H=2048 (14.95 -> 14.47 only — hypothesis count is the big
    lever). The DEFAULT is therefore H=8192: the measured-best config
    above, and the hypothesis axis is nearly free on TPU (one batched
    (H,8,9) SVD + an (H,N) matmul-shaped score tensor; the 4x over
    H=2048 costs far less than 4x wall time). On the corridor
    comparison this default makes the OFFLINE device solver beat the
    online host-cv2 tail on all three matchers
    (artifacts/offline_online_corridor.json). In the full VO pipeline
    the all-device combination (dense
    matcher + this estimator) reaches 0.0366 total error vs the
    reference-style host pipeline's 0.0712 (BF + cv2 USAC, 128x512).

    lo_hypotheses (round 4, measured negative): drawing the LO rounds'
    resamples from a SMALLER batch than the initial stage (1024 vs
    8192) preserves quality on the pose-tail harness (t-dir mean 3.38
    +- 0.24 vs 3.31 +- 0.12 over 3 seeds) but is SLOWER on a v5e (38.2
    vs 23.7 ms at restarts=3) — mixed stage shapes defeat XLA's kernel
    reuse across the three otherwise-identical stages. Default None
    (= n_hypotheses) is both the fastest and the measured-best
    configuration; the knob remains for non-TPU backends.

    restarts (round 4): the residual after the polish work was +-0.9 deg
    SEED variance concentrated on 2-3 hard low-parallax pairs — a
    selection problem, not a model problem. A cross-seed study
    (selecting per-pair among 3 existing single-stream runs by final
    inlier count) reached t-dir mean 7.27 / median 5.18 deg — better
    than every single stream (9.02-10.83 mean) and close to the
    per-pair oracle (5.28/3.25), validating consensus size as the
    selection signal. `restarts` ships that mechanism in-graph: the
    whole stream (sampling, LO, pool polish) is vmapped over `restarts`
    keys from `jax.random.split` inside the SAME program and the
    restart with the largest final consensus set wins. Measured on the
    harness (H=8192, restarts=3, probe seeds 0/1/2;
    artifacts/pose_tail_restarts3.json): t-dir mean 8.84/8.44/9.24
    (8.84 +- 0.33) — beats cv2's deterministic 9.26 at EVERY seed —
    and median 6.77/8.12/7.69 vs cv2's 8.09; seed spread of the mean
    tightened 0.9 -> 0.33 deg. Default restarts=3: the solver beats
    the cv2 tail on the mean and matches-or-beats it on the median, at
    3x the (hypothesis-parallel, TPU-cheap) solver cost.
    """
    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.ops.smallmat import cholesky_solve, nullvec, svd3

    pts0 = jnp.asarray(kpn_cur)  # cv2 operand order; dtype follows the
    pts1 = jnp.asarray(kpn_ref)  # inputs (f64 under jax.enable_x64)
    dt = pts0.dtype
    N = pts0.shape[0]
    v = (jnp.ones((N,), bool) if valid is None
         else jnp.asarray(valid, bool))
    vf = v.astype(dt)
    n_valid = jnp.maximum(vf.sum(), 1.0)

    # Hartley normalization over the VALID points (shared by all
    # hypotheses — the conditioning transform, not part of the model)
    def normalize(p):
        mean = (p * vf[:, None]).sum(0) / n_valid
        d = jnp.sqrt(((p - mean) ** 2).sum(-1))
        scale = jnp.sqrt(2.0) / jnp.maximum((d * vf).sum() / n_valid, 1e-9)
        T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        T = T.at[0, 0].set(scale).at[1, 1].set(scale)
        T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
        return (p - mean) * scale, T

    p0, T0 = normalize(pts0)
    p1, T1 = normalize(pts1)
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                   jnp.ones_like(x0)], axis=1)  # (N, 9)

    def essential_project(E):
        """Closest essential matrix (equal top singular pair, rank 2)
        via the closed-form batched svd3 — NOT jnp.linalg.svd, whose
        iterative TPU lowering costs 36 ms at (8192, 3, 3)
        (tools/pose_device_profile.py)."""
        U3, s3, V3 = svd3(E)
        sbar = 0.5 * (s3[..., 0] + s3[..., 1])
        return sbar[..., None, None] * (
            U3[..., :, 0:1] @ jnp.swapaxes(V3[..., :, 0:1], -1, -2)
            + U3[..., :, 1:2] @ jnp.swapaxes(V3[..., :, 1:2], -1, -2))

    def solve_hypotheses(idx):
        """(H, 8) index sets -> (H, 3, 3) essential candidates via the
        batched Cholesky inverse-iteration null-space solve + manifold
        projection. The svd it replaces was the measured solver
        bottleneck: 110 ms per (8192, 8, 9) batch on a v5e vs 2 ms for
        nullvec (artifacts/pose_device_profile.json)."""
        E_h = nullvec(A[idx]).reshape(-1, 3, 3)  # normalized frame
        E_h = T1.T[None] @ E_h @ T0[None]        # denormalize
        return essential_project(E_h)            # essential manifold

    def sample_idx(k, support, n=n_hypotheses):
        """(n, 8) distinct indices restricted to `support` via
        gumbel-top-k — no rejection loop, static shapes."""
        g = jax.random.gumbel(k, (n, N))
        g = jnp.where(support[None, :], g, -jnp.inf)
        _, idx = jax.lax.top_k(g, 8)
        return idx

    # --- MSAC scoring: Sampson distance, all hypotheses x all points ---
    h0 = jnp.concatenate([pts0, jnp.ones((N, 1))], -1)  # (N, 3)
    h1 = jnp.concatenate([pts1, jnp.ones((N, 1))], -1)

    def sampson(E):
        Ex0 = h0 @ E.T        # (N, 3) = (E @ h0^T)^T
        Etx1 = h1 @ E          # (N, 3) = (E^T @ h1^T)^T
        num = jnp.square((h1 * Ex0).sum(-1))
        den = (jnp.square(Ex0[:, 0]) + jnp.square(Ex0[:, 1])
               + jnp.square(Etx1[:, 0]) + jnp.square(Etx1[:, 1]))
        return num / jnp.maximum(den, 1e-12)

    t2 = jnp.asarray(threshold * threshold, dt)

    def msac_of(E):
        return jnp.where(v, jnp.minimum(sampson(E), t2), 0.0).sum()

    # --- decomposition + masked cheirality vote -------------------------
    def decompose_vote(E_c, wf):
        """E -> the 4-way (R, t) decomposition, cheirality-voted by the
        weighted midpoint-depth test (only wf-weighted points vote).
        Factors come from the closed-form svd3; its v2-sign convention
        at most swaps the Ra/Rb roles inside the candidate set the vote
        scans (equality-tested in tests/test_smallmat.py)."""
        u3, _, v3 = svd3(E_c)
        u, vt = u3, jnp.swapaxes(v3, -1, -2)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0],
                       [0.0, 0.0, 1.0]])
        Ra, Rb, tu = u @ W @ vt * d, u @ W.T @ vt * d, u[:, 2:3]

        def depth_votes(R, t):
            a = (R @ h0.T).T
            b = h1
            M00 = (a * a).sum(-1)
            M01 = -(a * b).sum(-1)
            M11 = (b * b).sum(-1)
            r0 = -(a * t.T).sum(-1)
            r1 = (b * t.T).sum(-1)
            det = M00 * M11 - M01 * M01
            # near-parallel rays (pure-rotation / distant points) make
            # det ~ 0 and z-signs numerical noise — such points must NOT
            # vote (cv2.recoverPose masks them too)
            ok = jnp.abs(det) >= 1e-12
            safe = jnp.where(ok, det, 1.0)
            z0 = (M11 * r0 - M01 * r1) / safe
            z1 = (M00 * r1 - M01 * r0) / safe
            return (((z0 > 0) & (z1 > 0) & ok).astype(dt) * wf).sum()

        cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
        votes = jnp.stack([depth_votes(R, t) for R, t in cands])
        k = jnp.argmax(votes)
        Rs = jnp.stack([c[0] for c in cands])
        ts = jnp.stack([c[1] for c in cands])
        return Rs[k], ts[k][:, 0]

    # --- multi-start Gauss-Newton polish ON THE ESSENTIAL MANIFOLD ------
    # The 8-point DLT solves in the full 3x3 space and projects; with
    # small baselines and pixel-noise "outliers" its models trail cv2's
    # 5-point (which enforces the essential structure exactly in the
    # minimal solve). Rather than a batched 10th-degree polynomial solver
    # (needs eig — not TPU-lowerable), polish (R, t) directly: minimize
    # the masked Sampson residual over the 5 true DOF (so(3) x tangent of
    # S^2) with jax.jacfwd Jacobians and 5 recentered GN steps, then
    # accept-if-better on MSAC. Polishing starts from EVERY pool
    # candidate (vmap), not just the argmin — on low-parallax pairs the
    # near-tied candidates polish into different basins and the best
    # polished MSAC wins (measured: closes the tail gap the single-start
    # polish left, corridor numbers in the function docstring).
    def exp_so3(w):
        th = jnp.sqrt((w ** 2).sum() + 1e-24)
        K = jnp.array([[0.0, -w[2], w[1]],
                       [w[2], 0.0, -w[0]],
                       [-w[1], w[0], 0.0]]) / th
        return (jnp.eye(3) + jnp.sin(th) * K
                + (1.0 - jnp.cos(th)) * (K @ K))

    def skew(t):
        return jnp.array([[0.0, -t[2], t[1]],
                          [t[2], 0.0, -t[0]],
                          [-t[1], t[0], 0.0]])

    def tangent_basis(t):
        a = jnp.where(jnp.abs(t[0]) < 0.9,
                      jnp.array([1.0, 0.0, 0.0]),
                      jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        return b1, jnp.cross(t, b1)

    def gn_step(R, t, wres):
        b1, b2 = tangent_basis(t)

        def resid(p):
            Rp = exp_so3(p[:3]) @ R
            tp = t + b1 * p[3] + b2 * p[4]
            tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
            E = skew(tp) @ Rp
            Ex0 = h0 @ E.T
            Etx1 = h1 @ E
            num = (h1 * Ex0).sum(-1)
            den = (jnp.square(Ex0[:, 0]) + jnp.square(Ex0[:, 1])
                   + jnp.square(Etx1[:, 0]) + jnp.square(Etx1[:, 1]))
            return (num / jnp.sqrt(jnp.maximum(den, 1e-12))) * wres

        z = jnp.zeros((5,), dt)
        J = jax.jacfwd(resid)(z)                    # (N, 5)
        r = resid(z)
        Hm = J.T @ J + 1e-12 * jnp.eye(5, dtype=dt)
        p = cholesky_solve(Hm, -(J.T @ r))
        Rn = exp_so3(p[:3]) @ R
        tn = t + b1 * p[3] + b2 * p[4]
        return Rn, tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)

    def polish_candidate(E_c, s_c):
        inl_c = (sampson(E_c) < t2) & v
        wres = inl_c.astype(dt)
        R0, t0 = decompose_vote(E_c, wres)
        # phase 1: masked GN on the binary inlier set
        R_gn, t_gn = R0, t0
        for _ in range(5):
            R_gn, t_gn = gn_step(R_gn, t_gn, wres)
        # phase 2: IRLS with Cauchy weights over ALL valid points. The
        # binary mask depends on which points the winning draw happens
        # to place inside the threshold — the measured source of
        # per-seed variance on hard low-parallax pairs. Soft weights
        # w = 1/(1 + d^2/t^2) use near-inliers' information too, which
        # barely moves easy pairs but stabilizes the hard ones.
        R_ir, t_ir = R_gn, t_gn
        for _ in range(5):
            d2r = sampson(skew(t_ir) @ R_ir)
            w_soft = vf / (1.0 + d2r / t2)
            R_ir, t_ir = gn_step(R_ir, t_ir, w_soft)

        def score_or_inf(R, t):
            s = msac_of(skew(t) @ R)
            ok = (jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
                  & jnp.isfinite(s))
            return jnp.where(ok, s, jnp.inf)

        # accept-if-better across {unpolished, masked GN, IRLS}
        cand_R = jnp.stack([R0, R_gn, R_ir])
        cand_t = jnp.stack([t0, t_gn, t_ir])
        cand_s = jnp.stack([s_c, score_or_inf(R_gn, t_gn),
                            score_or_inf(R_ir, t_ir)])
        j = jnp.argmin(cand_s)
        return cand_R[j], cand_t[j], cand_s[j]

    def _solve_one(stream_key):
        """One full RANSAC + LO + multi-start-polish stream from one
        PRNG key. restarts vmaps this whole function."""
        keys = jax.random.split(stream_key, 1 + lo_rounds)
        E_h = solve_hypotheses(sample_idx(keys[0], v))
        d2 = jax.vmap(sampson)(E_h)                  # (H, N)
        msac = jnp.where(v[None, :], jnp.minimum(d2, t2), 0.0).sum(-1)
        best = jnp.argmin(msac)
        E = E_h[best]
        score = msac[best]
        inl = (d2[best] < t2) & v                    # (N,) winner inliers

        # candidate POOL for the multi-start polish (see tail): the
        # top-K hypotheses by MSAC, merged across the initial round and
        # every LO round. Near-degenerate (low-parallax) pairs have a
        # flat MSAC landscape where several hypotheses score within
        # noise of each other but polish to different basins — polishing
        # only the single argmin was the measured source of the
        # t-direction tail gap vs cv2's 5-point (14.9 vs 9.3 deg mean
        # on corridor BF populations).
        POOL = max(1, pool)  # pool=1 degenerates to single-start polish
        negs, pidx = jax.lax.top_k(-msac, POOL)
        E_pool, s_pool = E_h[pidx], -negs

        # --- local optimization: resample minimal sets INSIDE the
        # winner's support (LO-RANSAC). A minimal 8-point hypothesis
        # from the full, noise-contaminated pool is imprecise; global
        # refits (weighted DLT, Sampson reweighting, threshold
        # annealing) were all measured WORSE than simply drawing fresh
        # minimal samples from the current inlier core and keeping the
        # best MSAC model (two such rounds reach cv2 USAC's support:
        # 117.8 vs 118.6 mean inliers on corridor pairs, vs 85.9 for
        # the single global refit). Every candidate — including
        # degenerate ones when the support is tiny — is accept-if-better
        # on the FULL MSAC score, so the result can only improve; static
        # shapes throughout.
        H_lo = lo_hypotheses or n_hypotheses
        for lo_key in keys[1:]:
            E2_h = solve_hypotheses(sample_idx(lo_key, inl, H_lo))
            msac2 = jnp.where(v[None, :],
                              jnp.minimum(jax.vmap(sampson)(E2_h), t2),
                              0.0).sum(-1)
            b2 = jnp.argmin(msac2)
            take = msac2[b2] < score
            E = jnp.where(take, E2_h[b2], E)
            score = jnp.minimum(msac2[b2], score)
            inl = (sampson(E) < t2) & v
            # inlier-weighted DLT refit, also accept-if-better
            w = inl.astype(dt)[:, None]
            E_r = T1.T @ nullvec(A * w).reshape(3, 3) @ T0
            E_r = essential_project(E_r)
            take_r = msac_of(E_r) < score
            E = jnp.where(take_r, E_r, E)
            score = jnp.minimum(msac_of(E_r), score)
            inl = (sampson(E) < t2) & v
            # merge this round's top hypotheses + refit into the pool
            negs2, pidx2 = jax.lax.top_k(-msac2, POOL)
            E_pool = jnp.concatenate([E_pool, E2_h[pidx2], E_r[None]])
            s_pool = jnp.concatenate([s_pool, -negs2,
                                      msac_of(E_r)[None]])
            negs3, keep = jax.lax.top_k(-s_pool, POOL)
            E_pool, s_pool = E_pool[keep], -negs3

        R_cs, t_cs, s_cs = jax.vmap(polish_candidate)(E_pool, s_pool)
        kb = jnp.argmin(s_cs)
        R_fin, t_fin = R_cs[kb], t_cs[kb]
        # sampson is scale-invariant, so skew(t) @ R reproduces the
        # winner's E up to the scale/sign the metric ignores
        inl_fin = (sampson(skew(t_fin) @ R_fin) < t2) & v
        return R_fin, t_fin, inl_fin

    if restarts <= 1:
        R_fin, t_fin, inl = _solve_one(key)
        return R_fin, t_fin[:, None], inl

    # best-of-restarts by final consensus size (RANSAC's own selection
    # criterion, applied across independent streams): the streams share
    # every key-independent tensor (A, h0/h1, normalization) and differ
    # only in their draws, so vmap keeps this one program.
    rkeys = jax.random.split(key, restarts)
    Rs, ts, inls = jax.vmap(_solve_one)(rkeys)
    j = jnp.argmax(inls.sum(-1))
    return Rs[j], ts[j][:, None], inls[j]


def estimate_pose_device(kpn_ref, kpn_cur):
    """On-device essential-matrix pose (the analog of the reference's torch
    pose path, src/visual_odometry/visual_odometry.py:414-437, which solves
    E on-device via kornia and decomposes it with a cheirality check).

    kpn_ref/kpn_cur: (N, 2) NORMALIZED image-plane correspondences (already
    undistorted/unprojected). Uses the 8-point DLT (the reference's own
    fallback branch builds E from a fundamental-matrix fit, :428-432) with
    Hartley normalization, rank-2 projection, the 4-way (R, t)
    decomposition and a midpoint-depth cheirality vote — all jnp ops, so it
    jits/batches (vmap) on TPU. The production VO tail stays cv2 USAC_MSAC
    (robust to outliers); this path serves compiled pipelines fed with
    pre-filtered matches.

    Returns (R (3,3), t (3,1) unit norm, n_positive_depth).
    """
    import jax.numpy as jnp

    # operand order mirrors estimate_pose's cv2 call
    # (findEssentialMat(kpn_cur, kpn_ref) / recoverPose(E, kpn_cur,
    # kpn_ref)) so the returned (R, t) share the cv2 convention
    pts0 = jnp.asarray(kpn_cur, jnp.float32)
    pts1 = jnp.asarray(kpn_ref, jnp.float32)

    def normalize(p):
        mean = p.mean(axis=0)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sqrt(((p - mean) ** 2).sum(-1)).mean(), 1e-9)
        T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        T = T.at[0, 0].set(scale).at[1, 1].set(scale)
        T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
        return (p - mean) * scale, T

    p0, T0 = normalize(pts0)
    p1, T1 = normalize(pts1)
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    # epipolar constraint x1^T E x0 = 0 rows
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                   jnp.ones_like(x0)], axis=1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    E = T1.T @ E @ T0  # denormalize
    # project onto the essential manifold (equal singular values, rank 2)
    u, s, vt = jnp.linalg.svd(E)
    sbar = (s[0] + s[1]) / 2.0
    E = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * sbar) @ vt

    # 4-way decomposition (Hartley & Zisserman 9.19)
    u, _, vt = jnp.linalg.svd(E)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = u @ W @ vt * d
    Rb = u @ W.T @ vt * d
    tu = u[:, 2:3]

    def depth_votes(R, t):
        # midpoint-free linear triangulation depth signs for both cameras
        h0 = jnp.concatenate([pts0, jnp.ones_like(x0[:, None])], -1)  # (N,3)
        h1 = jnp.concatenate([pts1, jnp.ones_like(x1[:, None])], -1)
        # z0 * R h0 + t ~ z1 * h1: solve per-point 2-unknown LSQ
        a = (R @ h0.T).T  # (N, 3)
        b = h1
        # [a, -b] [z0, z1]^T = -t
        M00 = (a * a).sum(-1)
        M01 = -(a * b).sum(-1)
        M11 = (b * b).sum(-1)
        r0 = -(a * t.T).sum(-1)
        r1 = (b * t.T).sum(-1)
        det = M00 * M11 - M01 * M01
        ok = jnp.abs(det) >= 1e-12  # degenerate rays must not vote
        safe = jnp.where(ok, det, 1.0)
        z0 = (M11 * r0 - M01 * r1) / safe
        z1 = (M00 * r1 - M01 * r0) / safe
        return ((z0 > 0) & (z1 > 0) & ok).sum()

    cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
    votes = jnp.stack([depth_votes(R, t) for R, t in cands])
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], votes[best]
