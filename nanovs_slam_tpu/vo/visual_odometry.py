"""Stateful frame-to-frame visual odometry.

Behavioral contract (reference: src/visual_odometry/visual_odometry.py:75-472
and src/evaluation/visual_odometry.py:200-332):
- per frame: resize -> extract keypoints/descriptors -> match against the
  previous frame (BF ratio-test or LightGlue) -> essential-matrix pose
  (USAC_MSAC) -> integrate cur_t += scale * cur_R @ t; cur_R = cur_R @ R.
- pose-estimation failure falls back to identity
  (evaluation/visual_odometry.py:256-265).
- per-frame relative errors vs GT with GT absolute scale.

TPU-first: extraction (and LightGlue matching when enabled) runs on device
with fixed shapes; only the RANSAC tail (cv2 five-point essential matrix)
is host-side — matching the reference's own use of OpenCV's C++ solvers.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import time

from .camera import PinholeCamera
from .groundtruth import KittiVideoGroundTruth
from .matcher import (match_crosscheck_fundamental, match_keypoints,
                      match_keypoints_flann, match_semantic)
from .pose import (calculate_error_stats, calculate_relative_error,
                   estimate_pose)


class VisualOdometryStats:
    def __init__(self):
        self.n_matches = []
        self.n_inliers = []
        self.network_inference_timing = []
        self.pose_estimation_timing = []

    def as_dict(self) -> Dict:
        def stats(v):
            a = np.asarray(v, np.float64)
            return calculate_error_stats(a) if len(a) else {}
        return {
            "n_matches": stats(self.n_matches),
            "n_inliers": stats(self.n_inliers),
            "network_inference_timing": stats(self.network_inference_timing),
            "pose_estimation_timing": stats(self.pose_estimation_timing),
        }


class VisualOdometry:
    """Matcher modes (reference visual_odometry.py:72-97 `matcher` conf +
    feature_matcher.py variants): "bf" (exact GEMM kNN + ratio + 1-to-1),
    "flann" (approximate KD-tree kNN, same tail), "crosscheck" (mutual NN +
    fundamental model fit), "semantic" (per-seg-class BF matching; needs a
    frontend built with with_seg/semantic_filter so kp_class is produced),
    "lightglue" (on-device transformer matcher), "dense" (detector-free
    image-pair matching — the reference's LoFTR mode,
    visual_odometry.py:134-136,296-310, rebuilt natively on the model's
    own dense descriptor map since kornia's pretrained LoFTR is not
    installable here; see matching/dense.py). In dense mode the keypoint
    frontend is bypassed entirely and the previous frame's dense feature
    map stays device-resident."""

    MATCHERS = ("bf", "flann", "crosscheck", "semantic", "lightglue",
                "dense")
    DENSE_MIN_MATCHES = 400

    def __init__(self, frontend, cam: PinholeCamera,
                 matcher: str = "bf", lightglue=None, dense=None,
                 top_k_matches: int = 1000, ratio_test: float = 0.7,
                 n_classes: int = 28, dense_conf: float = 0.05,
                 dense_min_matches: Optional[int] = None,
                 dense_rel_conf: float = 0.1,
                 device_pose: bool = False,
                 pose_hypotheses: int = 8192, pose_restarts: int = 3):
        # dense_conf (the LEGACY absolute threshold, used when
        # dense_rel_conf=0): dual-softmax confidence mass spreads over
        # ~1200 coarse cells, so its absolute scale is far below the
        # reference's 0.7 pretrained-LoFTR filter. Round-4 operating
        # curve on held-out homography pairs with the trained extractor
        # (tools/matcher_benchmark.py --dense --dense-rel 0.1 0.2 0.3
        # 0.5): ADAPTIVE rel=0.1 -> precision 0.831 / recall 0.317 /
        # 207 matches per pair; rel=0.2 -> 0.851/0.140/90; absolute
        # 0.05 -> 0.854/0.154/99. rel=0.1 DOUBLES recall at ~2% lower
        # precision vs the legacy point — hence the default.
        #
        # DENSE_MIN_MATCHES=400, not 50: on scenes where no confidence
        # clears the absolute threshold (repetitive texture flattens the
        # softmax; corridor-fixture max conf is 0.049), the top-N ranking
        # fallback IS the match source, and the most-confident cells
        # cluster on the low-flow far wall near the epipole — a geometry
        # that barely constrains translation. Corridor-fixture sweep
        # (r3_long weights): 240x320/12f N=50 -> total err 0.533,
        # N=128 -> 0.282, N=256 -> 0.074, N=400 -> 0.020;
        # 128x512/30f N=50 -> 0.253, N=256 -> 0.024, N=400 -> 0.023.
        # 400 keeps a filtering margin below the k=512 slot budget; at
        # that setting the dense mode beats BF (0.071) and trained
        # LightGlue (0.039) at the reference's own 128x512 VO protocol.
        if matcher not in self.MATCHERS:
            raise ValueError(f"matcher must be one of {self.MATCHERS}")
        if matcher == "dense" and dense is None:
            raise ValueError("matcher='dense' needs a DenseMatcher "
                             "(matching/dense.py) via dense=")
        if matcher == "lightglue" and lightglue is None:
            # fail loudly instead of silently falling through to BF in
            # _match — --lg_ckpt is easy to forget on the CLIs
            raise ValueError("matcher='lightglue' needs lightglue= (the "
                             "load_lightglue_for_vo tuple; CLIs: pass "
                             "--lg_ckpt)")
        self.frontend = frontend
        self.cam = cam
        self.matcher = matcher
        # (model, params, size, max_n) from load_lightglue_for_vo, or None
        self.lightglue = lightglue
        self.dense = dense  # DenseMatcher or None
        self.dense_conf = dense_conf
        # dense_rel_conf > 0 switches the dense filter to a PER-PAIR
        # adaptive threshold, rel * max(conf): a fixed absolute cut over
        # an (N-cell) dual-softmax is scale-wrong by construction (the
        # mass spreads with cell count and texture; on the corridor
        # fixture NO cell ever clears 0.05, so the absolute path was
        # dead and every match came from the top-N fallback). The
        # relative rule tracks each pair's own confidence scale, so the
        # confident path fires on every frame (corridor: 12-136
        # matches/frame at rel=0.1); the min-matches rank TOP-UP (not
        # replacement) below still guarantees pose is never starved.
        # Set dense_rel_conf=0 to restore the legacy absolute
        # threshold.
        self.dense_rel_conf = dense_rel_conf
        if dense_min_matches is not None:
            self.DENSE_MIN_MATCHES = dense_min_matches  # instance override
        # device_pose=True replaces the host cv2 USAC_MSAC tail with the
        # on-device batched-hypothesis RANSAC (pose.ransac_essential_device)
        # — the last host stage of the frame loop moves onto the chip.
        # Jitted programs are cached per pad-slot count.
        self.device_pose = device_pose
        # solver knobs (pose.ransac_essential_device): hypothesis count
        # and best-of-N restart streams — the measured-best defaults;
        # both scale the hypothesis-parallel (TPU-cheap) stage only
        self.pose_hypotheses = pose_hypotheses
        self.pose_restarts = pose_restarts
        self._pose_jit = {}
        self._frame_idx = 0
        self.fmap_prev = None  # device-resident dense map (dense mode)
        self.top_k_matches = top_k_matches
        self.ratio_test = ratio_test
        self.n_classes = n_classes

        self.cur_R = np.eye(3)
        self.cur_t = np.zeros((3, 1))
        self.kps_prev = None
        self.feat_prev = None
        self.seg_prev = None
        self.stats = VisualOdometryStats()
        self.estimation_fails = 0
        self.trajectory = []
        # last matched pair + RANSAC inlier mask, for track drawing
        # (reference kps0/kps1/mask_match, visual_odometry.py:316-318)
        self.m_kps0 = np.zeros((0, 2))
        self.m_kps1 = np.zeros((0, 2))
        self.mask_match = np.zeros((0,), bool)

    def _extract(self, img01, prefetched=None):
        """Timed frontend run (reference timing_decorator on inference,
        visual_odometry.py:14-23,188). With `prefetched` (a handle from
        begin_extract), only the fetch/trim is timed — the device ran
        while the host did other work."""
        t0 = time.perf_counter()
        if prefetched is not None:
            kps, feat, out = self.frontend.fetch(prefetched)
        else:
            kps, feat, out = self.frontend.run(img01)
        self.stats.network_inference_timing.append(time.perf_counter() - t0)
        return kps, feat, out

    def begin_extract(self, img01):
        """Dispatch frame extraction WITHOUT waiting (JAX async
        dispatch); pass the returned handle to process_image(...,
        prefetched=). Overlaps device extraction of frame t+1 with the
        host RANSAC tail of frame t (SURVEY §7.3). Returns None when the
        frontend has no async surface (matching then runs eagerly)."""
        if self.matcher != "dense" and hasattr(self.frontend, "run_async"):
            return self.frontend.run_async(img01)
        return None

    def init(self, img01: np.ndarray):
        if self.matcher == "dense":
            t0 = time.perf_counter()
            self.fmap_prev = self.dense.extract(img01)
            self.stats.network_inference_timing.append(
                time.perf_counter() - t0)
        else:
            self.kps_prev, self.feat_prev, out = self._extract(img01)
            self.seg_prev = out.get("kp_class")
        self.trajectory.append(self.cur_t.copy())

    def _match_dense(self, img01: np.ndarray):
        """Detector-free pair matching (reference LoFTR branch,
        visual_odometry.py:296-310): extract the new frame's dense map,
        match against the device-resident previous map, filter by
        confidence on host."""
        t0 = time.perf_counter()
        fmap = self.dense.extract(img01)
        self.stats.network_inference_timing.append(time.perf_counter() - t0)
        kp0, kp1, conf = self.dense.match_maps(self.fmap_prev, fmap)
        kp0, kp1, conf = np.asarray(kp0), np.asarray(kp1), np.asarray(conf)
        if self.dense_rel_conf > 0:
            # adaptive per-pair threshold (see __init__); the argmax
            # cell always clears rel * max, so the confident path
            # produces >= 1 match on every frame
            thr = self.dense_rel_conf * conf.max()
        else:
            thr = self.dense_conf
        keep = conf > thr
        if keep.sum() < self.DENSE_MIN_MATCHES:
            # rank TOP-UP to the minimum pose budget (a superset of the
            # confident set — dual-softmax confidence is calibrated by
            # training, so a threshold alone can starve the pose tail);
            # never admit conf==0 pairs: coarse_match zeroes exactly the
            # pairs that FAILED the mutual-NN check, so they are
            # known-wrong correspondences, not merely low-confidence ones
            keep = np.argsort(-conf)[:self.DENSE_MIN_MATCHES]
            keep = keep[conf[keep] > 0.0]
        self.fmap_prev = fmap
        return kp0[keep], kp1[keep]

    def _match(self, kps, feat, seg):
        if self.matcher == "lightglue" and self.lightglue is not None:
            return self._match_lightglue(kps, feat)
        if self.matcher == "semantic":
            if seg is None or self.seg_prev is None:
                raise ValueError(
                    "semantic matching needs per-keypoint classes; build "
                    "the frontend with with_seg=True or semantic_filter")
            return match_semantic(self.kps_prev, self.feat_prev,
                                  self.seg_prev, kps, feat, seg,
                                  self.n_classes, self.ratio_test)
        if self.matcher == "flann":
            return match_keypoints_flann(self.kps_prev, self.feat_prev,
                                         kps, feat, self.top_k_matches,
                                         self.ratio_test)
        if self.matcher == "crosscheck":
            return match_crosscheck_fundamental(self.kps_prev,
                                                self.feat_prev, kps, feat,
                                                self.ratio_test)
        return match_keypoints(self.kps_prev, self.feat_prev, kps, feat,
                               self.top_k_matches, self.ratio_test)

    def _match_lightglue(self, kps, feat):
        import jax.numpy as jnp

        from ..matching.lightglue import (inference_forward,
                                          normalize_keypoints)

        model, params, size, max_n = self.lightglue
        def pad(a, n, v=0.0):
            # truncate before padding: a frontend configured with
            # top_k > max_n would otherwise hit a shape mismatch here
            # (ADVICE r3). Frontend keypoints are score-sorted, so the
            # kept prefix is the strongest max_n.
            a = a[:n]
            out = np.full((n,) + a.shape[1:], v, a.dtype)
            out[:len(a)] = a
            return out

        kps_prev, feat_prev = self.kps_prev[:max_n], self.feat_prev[:max_n]
        kps, feat = kps[:max_n], feat[:max_n]
        n0, n1 = len(kps_prev), len(kps)
        data = {
            "keypoints0": normalize_keypoints(
                jnp.asarray(pad(kps_prev, max_n)[None]), size),
            "keypoints1": normalize_keypoints(
                jnp.asarray(pad(kps, max_n)[None]), size),
            "descriptors0": jnp.asarray(pad(feat_prev, max_n)[None]),
            "descriptors1": jnp.asarray(pad(feat, max_n)[None]),
            "mask0": jnp.asarray((np.arange(max_n) < n0)[None]),
            "mask1": jnp.asarray((np.arange(max_n) < n1)[None]),
        }
        # config-dispatched: honors cfg.width_confidence (static-bucket
        # width pruning) exactly as the reference's inference does
        pred = inference_forward(model, params, data)
        m0 = np.asarray(pred["matches0"])[0]
        valid = m0 > -1
        idx0 = np.nonzero(valid)[0]
        idx1 = m0[valid]
        return kps_prev[idx0[idx0 < n0]], kps[idx1[idx0 < n0]]

    def process_image(self, img01: np.ndarray, absolute_scale: float = 1.0,
                      prefetched=None):
        """Returns (R, t, n_matches); updates the integrated pose.
        `prefetched`: optional handle from begin_extract(img01)."""
        if self.matcher == "dense":
            kps = feat = seg = None
            dense_kps = self._match_dense(img01)  # times its own extract
        else:
            kps, feat, out = self._extract(img01, prefetched)
            seg = out.get("kp_class")
        t0 = time.perf_counter()
        try:
            if self.matcher == "dense":
                m_kps0, m_kps1 = dense_kps
            else:
                m_kps0, m_kps1 = self._match(kps, feat, seg)
            if self.device_pose:
                R, t, mask_match = self._estimate_pose_on_device(m_kps0,
                                                                 m_kps1)
            else:
                R, t, mask_match, _ = estimate_pose(m_kps0, m_kps1,
                                                    self.cam)
            n_inliers = int(np.count_nonzero(mask_match))
            self.mask_match = np.asarray(mask_match).reshape(-1) != 0
        except ValueError:
            raise  # configuration errors must surface
        except Exception:
            R, t = np.eye(3), np.zeros((3, 1))
            m_kps0 = np.zeros((0, 2))
            m_kps1 = np.zeros((0, 2))
            n_inliers = 0
            self.mask_match = np.zeros((0,), bool)
            self.estimation_fails += 1
        self.m_kps0, self.m_kps1 = m_kps0, m_kps1
        self.stats.pose_estimation_timing.append(time.perf_counter() - t0)

        self.stats.n_matches.append(len(m_kps0))
        self.stats.n_inliers.append(n_inliers)
        # pose integration (visual_odometry.py:336-337)
        self.cur_t = self.cur_t + absolute_scale * self.cur_R.dot(t)
        self.cur_R = self.cur_R.dot(R)
        self.trajectory.append(self.cur_t.copy())

        if self.matcher != "dense":
            self.kps_prev, self.feat_prev, self.seg_prev = kps, feat, seg
        return R, t, len(m_kps0)

    def _estimate_pose_on_device(self, m_kps0, m_kps1):
        """Device RANSAC pose tail: undistort/unproject on host (cheap
        numpy), pad matches to a power-of-two slot count behind a
        validity mask so one jitted program serves a whole sequence, then
        run pose.ransac_essential_device (batched 8-point + MSAC + refit
        + cheirality, one XLA program). Deterministic per frame: the
        hypothesis key is fold_in(frame_idx)."""
        import jax

        from .pose import ransac_essential_device

        if len(m_kps0) < 8:
            raise RuntimeError("too few matches for the 8-point solver")
        kpn_ref = self.cam.unproject_points(
            self.cam.undistort_points(m_kps0)).astype(np.float32)
        kpn_cur = self.cam.unproject_points(
            self.cam.undistort_points(m_kps1)).astype(np.float32)
        n = len(kpn_ref)
        slots = max(512, 1 << int(np.ceil(np.log2(n))))
        if slots not in self._pose_jit:
            self._pose_jit[slots] = jax.jit(
                lambda a, b, k, v: ransac_essential_device(
                    a, b, k, valid=v, n_hypotheses=self.pose_hypotheses,
                    restarts=self.pose_restarts))
        pad = slots - n
        a = np.concatenate([kpn_ref, np.zeros((pad, 2), np.float32)])
        b = np.concatenate([kpn_cur, np.zeros((pad, 2), np.float32)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        key = jax.random.fold_in(jax.random.PRNGKey(0), self._frame_idx)
        self._frame_idx += 1
        R, t, inl = self._pose_jit[slots](a, b, key, valid)
        return (np.asarray(R, np.float64), np.asarray(t, np.float64),
                np.asarray(inl)[:n])

    def draw_feature_tracks(self, img: np.ndarray,
                            all_tracks: bool = False) -> np.ndarray:
        """Overlay prev->cur match tracks (green lines, red endpoint dots)
        on img; inliers only unless all_tracks (reference drawFeatureTracks
        / drawAllFeatureTracks, visual_odometry.py:439-472)."""
        import cv2

        draw = (cv2.cvtColor(img, cv2.COLOR_GRAY2RGB) if img.ndim == 2
                else img.copy())
        n = len(self.m_kps0)
        keep = (np.ones(n, bool) if all_tracks
                else (self.mask_match[:n] if len(self.mask_match) >= n
                      else np.zeros(n, bool)))
        for p_cur, p_ref in zip(self.m_kps1[keep].astype(int),
                                self.m_kps0[keep].astype(int)):
            cv2.line(draw, tuple(p_cur[:2]), tuple(p_ref[:2]),
                     (0, 255, 0), 1)
            cv2.circle(draw, tuple(p_cur[:2]), 1, (0, 0, 255), -1)
        return draw


def load_lightglue_for_vo(lg_ckpt: str, nfeatures: int, frame_size,
                          max_n: int = 1024, threshold: float = 0.0,
                          width_confidence: float = -1.0):
    """Build the (model, params, size, max_n) tuple VisualOdometry's
    lightglue mode consumes, from a train_lightglue.py checkpoint.

    frame_size is the ORIGINAL (W, H) of the video frames — VO matchers
    see keypoints rescaled back to camera coordinates (reference
    visual_odometry.py:119-121), so keypoint normalization must use the
    full frame."""
    import dataclasses

    from ..matching.configs import LIGHTGLUE_CONFIGS
    from ..matching.lightglue import LightGlue
    from ..utils.checkpoint import load_checkpoint

    tree, meta = load_checkpoint(lg_ckpt)
    name = "kp2dtiny_S"
    if isinstance(meta, dict):
        name = meta.get("config", {}).get("lg_config", name)
    lg_cfg = LIGHTGLUE_CONFIGS.get(name, LIGHTGLUE_CONFIGS["kp2dtiny_S"])
    if lg_cfg.input_dim != nfeatures:
        lg_cfg = dataclasses.replace(lg_cfg, input_dim=nfeatures,
                                     descriptor_dim=nfeatures)
    lg_cfg = dataclasses.replace(lg_cfg, filter_threshold=threshold,
                                 width_confidence=width_confidence)
    return (LightGlue(lg_cfg), tree["params"],
            tuple(frame_size), max_n)


def prep_frame(frame_bgr: np.ndarray, new_size=None) -> np.ndarray:
    """BGR uint8 frame -> RGB float [0,1] at new_size (H, W).

    Resizes in FLOAT: uint8 cv2.resize quantizes the interpolated values
    back to 8 bits, a ~0.2%-per-pixel noise floor that is enough to flip
    ratio-test survivors downstream (the reference resizes float
    tensors, visual_odometry.py:77-80). Shared by the online and offline
    (vo/offline.py) eval paths so their input numerics stay identical.
    """
    import cv2

    rgb = cv2.cvtColor(frame_bgr,
                       cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    if new_size is not None:
        rgb = cv2.resize(rgb, (new_size[1], new_size[0]))
    return rgb


def evaluate_visual_odometry(frontend, kitti_path: str, gt_name: str,
                             video_name: str, new_size=None,
                             max_frames: Optional[int] = None,
                             verbose: bool = False,
                             matcher: str = "bf", dense=None,
                             lightglue=None,
                             device_pose: bool = False,
                             dense_rel_conf: float = 0.1,
                             lg_width: float = -1.0,
                             lg_threshold: float = 0.0,
                             pose_hypotheses: int = 8192,
                             pose_restarts: int = 3,
                             transfer_u8: Optional[bool] = None) -> Dict:
    """KITTI video VO eval (evaluation/visual_odometry.py:200-332):
    per-frame relative pose errors vs GT. lightglue: either the
    (model, params, size, max_n) tuple or a checkpoint path string
    (loaded via load_lightglue_for_vo).

    transfer_u8: ship frames to the device as uint8 (4x smaller
    per-frame transfer; normalization runs in-graph, ops/image.py).
    None (default) auto-enables it iff the model computes in bf16,
    where the u8 quantization step equals the input-cast ulp. Frames
    are still RESIZED in float (the r3 uint8-resize finding) — only
    the transfer quantizes."""
    import cv2

    from .camera import kitti_params

    gt = KittiVideoGroundTruth(kitti_path, gt_name)
    cap = cv2.VideoCapture(f"{kitti_path}/{video_name}")
    ret, frame = cap.read()
    if not ret:
        raise RuntimeError(f"cannot read {kitti_path}/{video_name}")
    size = frame.shape
    fx, fy, cx, cy = kitti_params()
    cam = PinholeCamera(size[1], size[0], fx, fy, cx, cy)

    if transfer_u8 is None:
        cfg = getattr(frontend, "cfg", None)
        transfer_u8 = str(getattr(cfg, "dtype", "float32")) == "bfloat16"

    def prep(f):
        img01 = prep_frame(f, new_size)
        if transfer_u8:
            from ..ops.image import quantize_u8
            return quantize_u8(img01)
        return img01

    sx = size[1] / (new_size[1] if new_size else size[1])
    sy = size[0] / (new_size[0] if new_size else size[0])

    class ScaledFrontend:
        def run(self, img01):
            pts, feat, out = frontend.run(img01)
            pts = pts * np.array([sx, sy])
            return pts, feat, out

        if hasattr(frontend, "run_async"):
            def run_async(self, img01):
                return frontend.run_async(img01)

            def fetch(self, handle):
                pts, feat, out = frontend.fetch(handle)
                return pts * np.array([sx, sy]), feat, out

    class ScaledDense:
        """Scales dense-match coordinates from the resized frame back to
        the original camera frame (reference 'apply resizing factors to
        the keypoints', visual_odometry.py:310)."""

        def __init__(self, dm):
            self.dm = dm

        def extract(self, img01):
            return self.dm.extract(img01)

        def match_maps(self, f0, f1):
            kp0, kp1, conf = self.dm.match_maps(f0, f1)
            s = np.array([sx, sy], np.float32)
            return np.asarray(kp0) * s, np.asarray(kp1) * s, conf

    if isinstance(lightglue, str):
        nfeat = getattr(getattr(frontend, "cfg", None), "nfeatures", None)
        if nfeat is None:  # fall back to the descriptor dim of frame 0
            nfeat = frontend.run(prep(frame))[1].shape[-1]
        # pad slots must cover the frontend's keypoint budget
        max_n = max(int(getattr(frontend, "top_k", 0) or 0), 1024)
        lightglue = load_lightglue_for_vo(lightglue, nfeat,
                                          (size[1], size[0]), max_n=max_n,
                                          threshold=lg_threshold,
                                          width_confidence=lg_width)
    vo = VisualOdometry(ScaledFrontend(), cam, matcher=matcher,
                        dense=ScaledDense(dense) if dense is not None
                        else None, lightglue=lightglue,
                        device_pose=device_pose,
                        dense_rel_conf=dense_rel_conf,
                        pose_hypotheses=pose_hypotheses,
                        pose_restarts=pose_restarts)
    vo.init(prep(frame))

    # pipelined frame loop: frame t+1's extraction is DISPATCHED before
    # frame t's host RANSAC tail runs, so the device computes while the
    # host solves (SURVEY §7.3 "overlapping device extraction with host
    # RANSAC"); results are bit-identical to the sequential loop.
    i_frame = 1
    t_errs, r_errs = [], []
    pending = None  # (img, extraction handle)
    while True:
        ret, frame = cap.read()
        frame_idx = i_frame + (1 if pending is not None else 0)
        more = ret and (max_frames is None or frame_idx < max_frames)
        if more:
            img = prep(frame)
            handle = vo.begin_extract(img)
        if pending is not None:
            p_img, p_handle = pending
            R, t, _ = vo.process_image(p_img, prefetched=p_handle)
            t_err, r_err = calculate_relative_error(gt, i_frame, R, t)
            t_errs.append(t_err)
            r_errs.append(r_err)
            i_frame += 1
        if not more:
            break
        pending = (img, handle)

    from .pose import assemble_vo_error_stats

    errs = assemble_vo_error_stats(t_errs, r_errs)
    if verbose:
        return {**errs,
                "estimation_fails": vo.estimation_fails,
                "stats": vo.stats.as_dict(),
                "trajectory": [t.reshape(3).tolist()
                               for t in vo.trajectory]}
    return errs["total"]
