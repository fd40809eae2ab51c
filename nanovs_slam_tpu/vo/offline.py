"""Offline sequence VO: the whole trajectory as a few XLA programs.

The online loop (`vo/visual_odometry.py`) mirrors the reference's
frame-at-a-time semantics (evaluation/visual_odometry.py:200-332),
pipelining device extraction against the host pose tail. Offline
*evaluation* has no such constraint, so this module restructures the
whole sequence for the hardware:

1. ONE batched forward extracts every frame's dense feature map —
   batch = frames, the MXU's favourite axis (docs/KERNELS.md batch
   scaling: cost quantizes to ceil(B/128) lane-tiles). Frames travel
   as uint8 with normalization in-graph (4x smaller transfer; the
   quantization step equals the bf16 input-cast ulp, so the bf16
   compute path sees the same values) and the whole padded sequence
   is one dispatch — measured 1584 -> 1027 ms per 30-frame corridor
   sequence on a live v5e (artifacts/offline_wall_probe.json);
2. ONE jitted program runs two `lax.map`s over consecutive pairs — a
   match map (coarse dual-softmax + fine soft-argmax,
   `matching/dense.py`; or the in-graph BF / LightGlue matchers) with
   pinhole unprojection (device camera twin semantics), then a pose map
   running the batched device RANSAC
   (`vo/pose.ransac_essential_device`) — zero host round-trips inside
   the sequence. Two maps, not one: XLA's scheduling of the fused
   match+solve body measured +66 ms/pair on a v5e (see pair_poses);
3. the host only integrates the (T-1) relative poses with GT scale and
   computes the reference's error stats.

Distortion is not modeled (same contract as the device camera twin —
the reference's torch twin also delegates undistortion to cv2); KITTI's
rectified frames have none.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..matching.dense import DenseMatcher, _l2n
from .groundtruth import KittiVideoGroundTruth
from .pose import (assemble_vo_error_stats, calculate_error_stats,
                   calculate_relative_error, ransac_essential_device)


class OfflineVO:
    """Sequence-level VO on the dense (detector-free), BF, or LightGlue
    matcher.

    model/cfg/variables: a KP2DTiny-family model (same contract as
    DenseMatcher). size: (H, W) inference size. cam: host PinholeCamera
    carrying the ORIGINAL frame intrinsics (keypoints are rescaled to
    the original frame before unprojection, reference
    visual_odometry.py:310). n_matches: the dense top-N pose budget
    (`VisualOdometry.DENSE_MIN_MATCHES` semantics, same measured
    default); dense_conf: absolute-threshold branch of the same policy.

    matcher: "dense" (default) extracts per-frame dense feature maps;
    "bf" / "lightglue" extract fixed-k sparse keypoints (the online
    frontend's top-k contract) and match in-graph — BF via
    `vo/matcher.bf_match_device` (device twin of the reference ratio +
    one-to-one matcher), LightGlue via the fixed-shape masked forward
    (same programs the online `--matcher lightglue` loop jits). For
    "lightglue" pass `lightglue=(model, params)` — a trained matcher,
    e.g. the first two elements of `load_lightglue_for_vo(...)`.
    """

    def __init__(self, model, cfg, variables, size: Tuple[int, int], cam,
                 k: int = 512, n_matches: int = 400,
                 dense_conf: float = 0.05, n_hypotheses: int = 8192,
                 extract_chunk: int = 16, matcher: str = "dense",
                 lightglue=None, ratio_test: float = 0.7,
                 dense_rel_conf: float = 0.1, restarts: int = 3,
                 pair_batch: int = 1, max_single_dispatch: int = 128):
        import jax
        import jax.numpy as jnp

        if matcher not in ("dense", "bf", "lightglue"):
            raise ValueError(f"unsupported offline matcher: {matcher!r}")
        if matcher == "lightglue" and lightglue is None:
            raise ValueError("matcher='lightglue' needs lightglue="
                             "(model, params)")
        self.matcher = matcher
        self.variables = variables
        self.H, self.W = size
        self.cam = cam
        self.extract_chunk = extract_chunk
        self.max_single_dispatch = max_single_dispatch

        from ..ops.image import to_model_input
        H, W = size
        sx, sy = cam.width / W, cam.height / H
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
        n_conf_needed = n_matches
        conf_thr = dense_conf

        def unproject(kp):
            scale = jnp.array([sx, sy], kp.dtype)
            return (kp * scale - jnp.array([cx, cy])) \
                / jnp.array([fx, fy])

        if matcher == "dense":
            self.dm = DenseMatcher(model, cfg, variables, size, k=k)
            dm = self.dm

            @jax.jit
            def extract_batch(variables, raw):
                """(B, H, W, 3) uint8 raw or float [0, 1] ->
                (B, Hf, Wf, C) fine maps (normalize in-graph)."""
                out = model.apply(variables, to_model_input(raw),
                                  False, False, ("desc",))
                return _l2n(out["feat"])

            rel_conf = dense_rel_conf

            def match_step(f0, f1):
                """One pair: dense match -> unproject -> normalized
                correspondences + validity."""
                kp0, kp1, conf = dm._match(f0, f1)
                rank = jnp.arange(conf.shape[0])
                # dense match policy (same as the online loop's
                # _match_dense): adaptive per-pair threshold
                # rel * max(conf) when rel_conf > 0 (absolute conf_thr
                # otherwise), topped up to the n_matches pose budget by
                # rank. Branch-free: top_k sorts conf descending, so the
                # confident set is exactly rank < n_over and the top-up
                # union is rank < max(n_over, n_matches).
                thr = jnp.where(rel_conf > 0, rel_conf * conf.max(),
                                conf_thr)
                n_over = (conf > thr).sum()
                keep = (rank < jnp.maximum(n_over, n_conf_needed)) \
                    & (conf > 0.0)
                return unproject(kp0), unproject(kp1), keep
        else:
            from ..matching.extractor import make_extractor
            from .matcher import bf_match_device

            sparse_extract = make_extractor(model, cfg, H, W,
                                            max_keypoints=k)

            @jax.jit
            def extract_batch(variables, raw):
                """(B, H, W, 3) uint8 raw or float [0, 1] ->
                (kp (B,k,2), desc (B,k,C), mask (B,k)) — the online
                frontend's fixed-top-k contract (normalize in-graph)."""
                e = sparse_extract(variables, to_model_input(raw))
                return (e["keypoints"], e["descriptors"], e["mask"])

            if matcher == "lightglue":
                from ..matching.lightglue import normalize_keypoints
                lg_model, lg_params = lightglue[0], lightglue[1]

            def match_step(e0, e1):
                kp0, d0, m0 = e0
                kp1, d1, m1 = e1
                if matcher == "bf":
                    t_idx, valid = bf_match_device(d0, d1, m0, m1,
                                                   ratio_test)
                else:
                    # the online loop matches keypoints rescaled to the
                    # ORIGINAL frame (reference visual_odometry.py:
                    # 119-121), so normalization uses the camera size
                    scale = jnp.array([sx, sy], kp0.dtype)
                    size = (cam.width, cam.height)
                    data = {
                        "keypoints0": normalize_keypoints(
                            (kp0 * scale)[None], size),
                        "keypoints1": normalize_keypoints(
                            (kp1 * scale)[None], size),
                        "descriptors0": d0[None], "descriptors1": d1[None],
                        "mask0": m0[None], "mask1": m1[None]}
                    pred = lg_model.apply({"params": lg_params}, data)
                    mtc = pred["matches0"][0]
                    valid = mtc >= 0
                    t_idx = jnp.maximum(mtc, 0)
                kp1m = jnp.take(kp1, t_idx, axis=0)
                return unproject(kp0), unproject(kp1m), valid

        def pose_step(kpn0, kpn1, valid, i, key):
            """One pair: device RANSAC on materialized correspondences.
            `i` is the GLOBAL pair index (keys the RANSAC sampler), so
            sharded and unsharded runs draw identical hypothesis
            streams."""
            R, t, inl = ransac_essential_device(
                kpn0, kpn1, jax.random.fold_in(key, i), valid=valid,
                n_hypotheses=n_hypotheses, restarts=restarts)
            return R, t[:, 0], inl.sum(), valid.sum()

        def pair_step(r0, r1, i, key):
            """match_step + pose_step for one pair — the sharded path's
            per-pair program (and the behavioral unit the two-map
            single-device program decomposes)."""
            kpn0, kpn1, valid = match_step(r0, r1)
            return pose_step(kpn0, kpn1, valid, i, key)

        bs = pair_batch if pair_batch and pair_batch > 1 else None

        @jax.jit
        def match_map(fmaps):
            """Frame representations (leading axis T; a (T, Hf, Wf, C)
            array for dense, a (kp, desc, mask) pytree for sparse) ->
            (T-1, N, 2) normalized correspondences x2 + validity."""
            T = jax.tree.leaves(fmaps)[0].shape[0]

            def mstep(i):
                r0 = jax.tree.map(lambda a: a[i], fmaps)
                r1 = jax.tree.map(lambda a: a[i + 1], fmaps)
                return match_step(r0, r1)

            return jax.lax.map(mstep, jnp.arange(T - 1), batch_size=bs)

        @jax.jit
        def pose_map(kpn0, kpn1, valid, key):
            """Materialized correspondences -> per-pair
            (R, t, n_inliers, n_matches) via the device RANSAC.

            pair_batch > 1 vmaps the solver over chunks of pairs
            (lax.map batch_size). MEASURED NEGATIVE on TPU (live v5e,
            128x512/30f, H=8192 restarts=3,
            artifacts/offline_batch_probe.json): 24.6 ms/pair at B=1 vs
            28.5 at B=2 and 29.0 at B=4 — the per-pair program already
            batches restarts*H = 24576 hypotheses, so extra pairs add
            (B, restarts, H, N) residual traffic without filling any
            idle lanes (same mechanism as the lo_hypotheses negative:
            the solver's batch axes saturate the chip). Default stays 1;
            the knob is kept for narrower configs (small H / restarts=1)
            and non-TPU backends."""
            T1m = kpn0.shape[0]

            def pstep(args):
                a, b, v, i = args
                return pose_step(a, b, v, i, key)

            return jax.lax.map(pstep, (kpn0, kpn1, valid,
                                       jnp.arange(T1m)), batch_size=bs)

        def pair_poses(fmaps, key):
            """TWO separately dispatched XLA programs, not one. Measured
            on a live v5e (128x512, 30 frames, H=8192 restarts=3): the
            match map costs 2 ms/pair alone and the pose map 24.6
            ms/pair alone, but any SINGLE program containing both —
            one fused map body, two sequential lax.maps, or two maps
            with an optimization_barrier between — runs the solver at
            ~92 ms/pair (+270%). Splitting at the dispatch level
            restores the sum of the parts (739 ms vs 2691 ms per
            sequence); the intermediate (T-1, N, 2) arrays stay on
            device, so the only cost is one extra dispatch."""
            kpn0, kpn1, valid = match_map(fmaps)
            return pose_map(kpn0, kpn1, valid, key)

        self._extract_batch = extract_batch
        self._match_map = match_map
        self._pose_map = pose_map
        self._pair_poses = pair_poses
        self._pair_step = pair_step
        self._match_step = match_step
        self._pose_step = pose_step
        self._pair_poses_sharded = {}

    def _build_sharded(self, mesh):
        """Shard the PAIR axis of the sequence across a device mesh: each
        device runs lax.map over its local slice of consecutive-pair
        feature maps (pure data parallelism — pairs are independent, no
        collectives needed). Global pair indices ride along so the
        per-pair RANSAC hypothesis streams are identical to the
        single-device run (poses differ only on accept-if-better MSAC
        ulp-ties under different program fusion)."""
        import jax
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:  # older jax: experimental alias
            from jax.experimental.shard_map import shard_map

        axis = mesh.axis_names[0]
        match_step = self._match_step
        pose_step = self._pose_step

        def local_match(f0s, f1s):
            return jax.lax.map(
                lambda args: match_step(args[0], args[1]), (f0s, f1s))

        def local_pose(kpn0, kpn1, valid, idxs, key):
            return jax.lax.map(
                lambda args: pose_step(args[0], args[1], args[2],
                                       args[3], key),
                (kpn0, kpn1, valid, idxs))

        # P(axis) is a prefix spec: it applies to every leaf of the
        # (possibly pytree-valued) frame representations. Match and
        # pose are SEPARATE programs for the same reason as pair_poses
        # (a single program containing both runs the solver ~4x slower
        # on a v5e); the sharded intermediates stay device-resident.
        m_fn = jax.jit(shard_map(local_match, mesh=mesh,
                                 in_specs=(P(axis), P(axis)),
                                 out_specs=P(axis)))
        p_fn = jax.jit(shard_map(local_pose, mesh=mesh,
                                 in_specs=(P(axis), P(axis), P(axis),
                                           P(axis), P()),
                                 out_specs=P(axis)))

        def fn(f0s, f1s, idxs, key):
            kpn0, kpn1, valid = m_fn(f0s, f1s)
            return p_fn(kpn0, kpn1, valid, idxs, key)

        return fn

    def relative_poses_sharded(self, frames01: np.ndarray, mesh,
                               seed: int = 0):
        """Multi-device offline VO: pairs sharded over `mesh`'s first
        axis. Pads the pair count to a multiple of the axis size
        (replicating the last pair) and drops the pads after. Same
        per-pair programs + keys as relative_poses; match sets are
        exactly equal, poses equal up to MSAC ulp-ties.
        """
        import jax
        import jax.numpy as jnp

        n_dev = mesh.shape[mesh.axis_names[0]]
        if mesh not in self._pair_poses_sharded:
            self._pair_poses_sharded[mesh] = self._build_sharded(mesh)
        fmaps = self.extract(frames01)
        f0s = jax.tree.map(lambda a: a[:-1], fmaps)
        f1s = jax.tree.map(lambda a: a[1:], fmaps)
        n_pairs = jax.tree.leaves(f0s)[0].shape[0]
        idxs = jnp.arange(n_pairs)
        pad = (-n_pairs) % n_dev
        if pad:
            def _pad(a):
                return jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)])

            f0s = jax.tree.map(_pad, f0s)
            f1s = jax.tree.map(_pad, f1s)
            idxs = _pad(idxs)
        R, t, ninl, nmat = self._pair_poses_sharded[mesh](
            f0s, f1s, idxs, jax.random.PRNGKey(seed))
        return (np.asarray(R)[:n_pairs], np.asarray(t)[:n_pairs],
                np.asarray(ninl)[:n_pairs], np.asarray(nmat)[:n_pairs])

    def extract(self, frames: np.ndarray):
        """(T, H, W, 3) uint8 raw or float [0, 1] -> device frame
        representations (dense fine maps, or (kp, desc, mask) for
        sparse matchers).

        uint8 is the TPU fast path: the host->device transfer is 4x
        smaller and normalization runs in-graph. On the bf16 compute
        path it is quality-neutral by construction: the u8 step in
        [-1, 1] (2/255 ~= 0.0078) equals the bf16 input-cast ulp near
        +-1 that the first conv applies anyway. Measured on a live v5e
        (30-frame 128x512 corridor, artifacts/offline_wall_probe.json):
        u8 transfer + single dispatch cut the full offline pipeline
        1584 -> 1027 ms (~460 ms transfer size, ~100 ms dispatch/
        normalize/concat).

        Dispatch: T pads to a multiple of extract_chunk (bucketed
        compile shapes); when the padded batch is <= max_single_dispatch
        the whole sequence runs as ONE program, else the fixed-shape
        chunk loop bounds compile cost for long sequences."""
        import jax

        frames = np.asarray(frames)
        T = len(frames)
        c = self.extract_chunk
        pad = (-T) % c
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, 0)])
        if len(frames) <= self.max_single_dispatch:
            fm = self._extract_batch(self.variables, frames)
            return jax.tree.map(lambda a: a[:T], fm)
        import jax.numpy as jnp

        maps = [self._extract_batch(self.variables, frames[i:i + c])
                for i in range(0, len(frames), c)]
        return jax.tree.map(lambda *chunks: jnp.concatenate(chunks)[:T],
                            *maps)

    def relative_poses(self, frames: np.ndarray, seed: int = 0):
        """(T, H, W, 3) uint8 raw or float [0, 1] -> (R (T-1,3,3),
        t (T-1,3), n_inliers (T-1,), n_matches (T-1,)) numpy arrays."""
        import jax

        fmaps = self.extract(frames)
        R, t, ninl, nmat = self._pair_poses(fmaps,
                                            jax.random.PRNGKey(seed))
        return (np.asarray(R), np.asarray(t), np.asarray(ninl),
                np.asarray(nmat))


def evaluate_visual_odometry_offline(model, cfg, variables,
                                     kitti_path: str, gt_name: str,
                                     video_name: str, new_size,
                                     cam=None,
                                     max_frames: Optional[int] = None,
                                     n_matches: int = 400,
                                     verbose: bool = False,
                                     matcher: str = "dense",
                                     lightglue=None,
                                     k: int = 512,
                                     dense_rel_conf: float = 0.1,
                                     n_hypotheses: int = 8192,
                                     restarts: int = 3,
                                     transfer_u8: Optional[bool] = None
                                     ) -> Dict:
    """Sequence-level counterpart of `evaluate_visual_odometry` (same
    error math, reference evaluation/visual_odometry.py:165-176,318-332):
    decode all frames, run OfflineVO, integrate with GT scale.

    matcher/lightglue/k: forwarded to OfflineVO (dense | bf | lightglue;
    lightglue = (model, params) from e.g. load_lightglue_for_vo).
    transfer_u8: ship frames to the device as uint8 (4x smaller over
    the tunnel; quantization step equals the bf16 input-cast ulp).
    None (default) auto-enables it iff the model computes in bf16 —
    frames are still RESIZED in float (the r3 uint8-resize finding),
    only the transfer quantizes."""
    import cv2

    from .camera import PinholeCamera, kitti_params

    gt = KittiVideoGroundTruth(kitti_path, gt_name)
    cap = cv2.VideoCapture(f"{kitti_path}/{video_name}")
    frames = []
    while True:
        ret, f = cap.read()
        if not ret or (max_frames is not None
                       and len(frames) >= max_frames):
            break
        frames.append(f)
    cap.release()
    if len(frames) < 3:
        raise RuntimeError(f"need >= 3 frames, got {len(frames)}")
    H, W = new_size
    fx, fy, cx, cy = kitti_params()
    if cam is None:
        cam = PinholeCamera(frames[0].shape[1], frames[0].shape[0],
                            fx, fy, cx, cy)

    from .visual_odometry import prep_frame

    stack = np.stack([prep_frame(f, (H, W)) for f in frames])
    if transfer_u8 is None:
        transfer_u8 = str(getattr(cfg, "dtype", "float32")) == "bfloat16"
    if transfer_u8:
        from ..ops.image import quantize_u8
        stack = quantize_u8(stack)
    vo = OfflineVO(model, cfg, variables, (H, W), cam,
                   n_matches=n_matches, matcher=matcher,
                   lightglue=lightglue, k=k,
                   dense_rel_conf=dense_rel_conf,
                   n_hypotheses=n_hypotheses, restarts=restarts)
    R, t, ninl, nmat = vo.relative_poses(stack)

    t_errs, r_errs = [], []
    for i in range(len(R)):
        te, re = calculate_relative_error(gt, i + 1, R[i].astype(float),
                                          t[i].astype(float)
                                          .reshape(3, 1))
        t_errs.append(te)
        r_errs.append(re)
    errs = assemble_vo_error_stats(t_errs, r_errs)
    if not verbose:
        return errs["total"]
    # integrate the trajectory with scale 1.0 — the SAME convention the
    # online eval path emits (evaluate_visual_odometry calls
    # process_image without absolute_scale, matching the reference's
    # eval loop), so the two verbose 'trajectory' outputs are directly
    # comparable (ADVICE r3)
    cur_R, cur_t = np.eye(3), np.zeros((3, 1))
    # leading zero entry matches VisualOdometry.init's append, so both
    # trajectories have one entry per frame
    trajectory = [cur_t.reshape(3).tolist()]
    for i in range(len(R)):
        cur_t = cur_t + cur_R @ t[i].astype(float).reshape(3, 1)
        cur_R = cur_R @ R[i].astype(float)
        trajectory.append(cur_t.reshape(3).tolist())
    return {**errs,
            "trajectory": trajectory,
            "estimation_fails": 0,  # branch-free: every pair returns a
            # pose; starved pairs surface as low n_inliers instead
            "stats": {"n_matches": calculate_error_stats(
                          nmat.astype(float)),
                      "n_inliers": calculate_error_stats(
                          ninl.astype(float))}}
