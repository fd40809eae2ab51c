"""VO feature-extraction frontend.

Behavioral contract (reference: src/visual_odometry/frontend.py:11-129):
normalize image (x - 0.5) * 2, forward + postprocess, flatten cells,
confidence mask score > nn_thresh (0.7), optional SEMANTIC FILTER (drop
keypoints whose sampled segmentation class is in classes_to_filter, with
seg nearest-sampled at keypoint coords), top-k selection.

TPU-first: the whole pipeline — model, postprocess, semantic filter and
top-K — is ONE jitted fixed-shape XLA program; only the final (K,·) arrays
cross to host. Invalid slots (below threshold / filtered class) carry
score <= 0 and a False validity flag instead of being dropped, so no
recompilation ever happens. The host tail trims them for the cv2-based
pose estimation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import KP2DTinyConfig
from ..ops.grid_sample import grid_sample_nearest
from ..ops.image import to_model_input
from ..ops.postprocess import post_process, top_k_keypoints


class KP2DTinyFrontend:
    def __init__(self, model, cfg: KP2DTinyConfig, variables,
                 new_size: Tuple[int, int], nn_thresh: float = 0.7,
                 top_k: int = 4000, semantic_filter: bool = False,
                 classes_to_filter: Sequence[int] = (21,),
                 with_seg: bool = False):
        """with_seg forces the segmentation head on even without the
        semantic filter (e.g. for visualization)."""
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.H, self.W = new_size
        self.nn_thresh = nn_thresh
        self.top_k = top_k
        self.semantic_filter = semantic_filter
        self.classes_to_filter = tuple(classes_to_filter)
        self.with_seg = with_seg
        self._infer = self._build()

    def _build(self):
        H, W, cfg = self.H, self.W, self.cfg
        # head gating: without the semantic filter, seg (and vlad) are not
        # needed — skipping them removes ~40% of the model FLOPs
        need_seg = self.semantic_filter and len(self.classes_to_filter) > 0
        heads = (("score", "loc", "desc", "seg")
                 if (need_seg or self.with_seg)
                 else ("score", "loc", "desc"))

        @jax.jit
        def infer(variables, raw):
            # normalize in-graph so callers can ship uint8 (4x smaller
            # transfer; ops/image.py) — float [0, 1] input traces to
            # the identical program as host-side normalization
            images = to_model_input(raw)
            out = self.model.apply(variables, images, False, False, heads)
            post = post_process(out, H, W, cfg.cell, cfg.cross_ratio,
                                eval_mode=True)
            score = post["score"].astype(jnp.float32)
            coord = post["coord"].astype(jnp.float32)
            feat = post["feat"].astype(jnp.float32)
            B, Hc, Wc, _ = score.shape

            if need_seg or self.with_seg:
                seg_map = post["seg"]  # (B, Hs, Ws, 1) argmax classes
                # sample seg class at keypoint coords (nearest,
                # kp2dtiny.py:633-637 with sample_segmentation=True)
                gx = coord[..., 0] / ((W - 1) / 2.0) - 1.0
                gy = coord[..., 1] / ((H - 1) / 2.0) - 1.0
                seg_at_kp = grid_sample_nearest(
                    seg_map.astype(jnp.float32),
                    jnp.stack([gx, gy], axis=-1))[..., 0]
                if need_seg:
                    bad = jnp.zeros(seg_at_kp.shape, bool)
                    for c in self.classes_to_filter:
                        bad = bad | (seg_at_kp == c)
                    score = jnp.where(bad[..., None], 0.0, score)
            else:
                seg_at_kp = jnp.zeros((B, Hc, Wc), jnp.float32)

            kp, s, d, valid, idx = top_k_keypoints(
                score, coord, feat, self.top_k, self.nn_thresh,
                with_indices=True)
            # per-keypoint class, aligned with the top-k selection
            kp_class = jnp.take_along_axis(
                seg_at_kp.reshape(B, Hc * Wc), idx, axis=1).astype(jnp.int32)
            return kp, s, d, valid, kp_class, post

        return infer

    def run_async(self, img: np.ndarray):
        """Dispatch extraction and return the DEVICE arrays immediately
        (JAX async dispatch): the expensive fetch/trim happens in
        fetch(). Lets a VO driver overlap device extraction of frame
        t+1 with the host RANSAC tail of frame t (SURVEY §7.3).

        img: (H, W, 3) float in [0, 1] OR uint8 raw — u8 ships a 4x
        smaller transfer and normalizes in-graph (ops/image.py)."""
        img = np.asarray(img)
        x = jnp.asarray(img if img.dtype == np.uint8
                        else img.astype(np.float32))[None]
        return self._infer(self.variables, x)

    def fetch(self, handle):
        """Device handle from run_async -> (pts, feat, out) numpy
        results, trimmed to valid slots."""
        kp, s, d, valid, kp_class, post = handle
        kp, d = np.asarray(kp[0]), np.asarray(d[0])
        valid = np.asarray(valid[0])
        out = {k: np.asarray(v) for k, v in post.items()}
        if self.semantic_filter or self.with_seg:
            out["kp_class"] = np.asarray(kp_class[0])[valid]
        return kp[valid], d[valid], out

    def run(self, img01: np.ndarray):
        """img01: (H, W, 3) float in [0, 1] (or uint8 raw) at self.new_size.
        Returns (pts (N,2), feat (N,C), out dict) trimmed to valid slots;
        out["kp_class"] is the per-keypoint segmentation class (N,) when the
        seg head runs (semantic_filter or with_seg), used by the semantic
        VO matcher (reference visual_odometry.py:347-380)."""
        return self.fetch(self.run_async(img01))
