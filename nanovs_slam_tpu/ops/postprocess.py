"""Inference post-processing: border mask, coord decode, descriptor
sampling, segmentation decode, fixed-shape top-K keypoint selection.

Behavioral contract (reference: kp2dtiny.py:593-647 post_processing, and the
score-threshold / top-k filtering the frontends do on host
(src/visual_odometry/frontend.py:108-126, src/evaluation/keypoints.py:124-128)).

TPU-first design: everything here is fixed-shape and jittable, so the whole
model + postprocess compiles into ONE XLA program. Data-dependent filtering
(score > 0.7, top-k) becomes top_k_keypoints: a fixed-K jax.lax.top_k with a
validity mask — downstream consumers (LightGlue, VO) run on padded arrays
without recompilation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .grid import decode_coords, remove_border
from .grid_sample import sample_descriptors

Array = jnp.ndarray


def post_process(out: Dict[str, Array], H: int, W: int, cell: int,
                 cross_ratio: float = 2.0, eval_mode: bool = True,
                 ) -> Dict[str, Array]:
    """Pure-function equivalent of KP2DTiny{V2,V3}.post_processing.

    Input dict fields (NHWC):
      score (B,Hc,Wc,1) sigmoid scores, coord (B,Hc,Wc,2) tanh shifts,
      feat (B,Hs,Ws,C) dense descriptors, seg (B,Hs,Ws,nCls).
    Returns a new dict with:
      score: border-masked scores (B,Hc,Wc,1)
      coord: decoded image coordinates (B,Hc,Wc,2)
      feat:  if eval_mode, per-cell descriptors sampled at keypoint coords,
             L2-normalized (B,Hc,Wc,C); else the dense map unchanged
      seg:   if eval_mode, argmax class map (B,Hs,Ws,1) (V2 applies softmax
             first, argmax identical; kp2dtiny.py:633-640)
    """
    out = dict(out)
    score = remove_border(out["score"])
    coord = decode_coords(out["coord"], H, W, cell, cross_ratio)
    if eval_mode:
        if "feat" in out:
            out["feat"] = sample_descriptors(out["feat"], coord, H, W)
        if "seg" in out:
            out["seg"] = jnp.argmax(out["seg"], axis=-1, keepdims=True)
    out["score"] = score
    out["coord"] = coord
    return out


def top_k_keypoints(score: Array, coord: Array, feat: Array, k: int,
                    conf_threshold: float = 0.0, with_indices: bool = False,
                    ):
    """Fixed-shape top-K keypoint selection.

    Replaces the reference's host-side boolean filtering + np.argpartition
    (frontend.py:108-126) with an on-device lax.top_k over all cells.

    score: (B, Hc, Wc, 1); coord: (B, Hc, Wc, 2); feat: (B, Hc, Wc, C)
    returns (kp_xy (B,K,2), kp_score (B,K), desc (B,K,C), valid (B,K) bool);
    entries below conf_threshold are marked invalid (their data is still the
    next-best cells, callers must respect the mask).
    """
    B, Hc, Wc, _ = score.shape
    k = min(k, Hc * Wc)  # more cells requested than exist: clamp
    s = score.reshape(B, Hc * Wc)
    c = coord.reshape(B, Hc * Wc, 2)
    f = feat.reshape(B, Hc * Wc, -1)
    top_s, idx = jax.lax.top_k(s, k)  # (B, K)
    kp = jnp.take_along_axis(c, idx[..., None], axis=1)
    ds = jnp.take_along_axis(f, idx[..., None], axis=1)
    valid = top_s > conf_threshold
    if with_indices:
        return kp, top_s, ds, valid, idx
    return kp, top_s, ds, valid
