"""KP2DTiny extractor for LightGlue training/inference (glue-factory
integration equivalent).

Behavioral contract (reference: gluefactory/models/extractors/kp2dtiny.py):
wrap the model as an extractor returning {keypoints, keypoint_scores,
descriptors} with top-k selection (:38-42) or threshold masking (:43-52).
The reference extractor calls an outdated tuple API (:35-36); this one
uses the dict API (SURVEY.md §7.4 note).

Also provides the homography ground-truth matcher used to supervise
LightGlue on homography pairs (glue-factory homography pipeline
semantics: two keypoint sets related by H; positives = mutual nearest
reprojections within th px; unmatched -> -1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import KP2DTinyConfig
from ..ops.postprocess import post_process, top_k_keypoints

Array = jnp.ndarray


def make_extractor(model, cfg: KP2DTinyConfig, H: int, W: int,
                   max_keypoints: int = 512, conf_threshold: float = 0.0):
    """Returns extract(variables, images) -> {keypoints (B,K,2),
    keypoint_scores (B,K), descriptors (B,K,C), mask (B,K)}; jittable."""

    @jax.jit
    def extract(variables, images: Array) -> Dict[str, Array]:
        # only the keypoint heads: skips the seg/vlad compute the
        # extractor never reads, and keeps it loadable with checkpoints
        # whose seg head has a different class count
        out = model.apply(variables, images, False, False,
                          ("score", "loc", "desc"))
        post = post_process(out, H, W, cfg.cell, cfg.cross_ratio,
                            eval_mode=True)
        kp, score, desc, valid = top_k_keypoints(
            post["score"].astype(jnp.float32),
            post["coord"].astype(jnp.float32),
            post["feat"].astype(jnp.float32),
            max_keypoints, conf_threshold)
        return {"keypoints": kp, "keypoint_scores": score,
                "descriptors": desc, "mask": valid}

    return extract


def warp_points_np(pts: np.ndarray, H: np.ndarray) -> np.ndarray:
    homo = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
    w = homo @ H.T
    return w[..., :2] / w[..., 2:]


def gt_matches_from_homography(kp0: np.ndarray, kp1: np.ndarray,
                               H: np.ndarray, mask0: np.ndarray,
                               mask1: np.ndarray, th: float = 3.0
                               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ground-truth assignment for a homography pair (glue-factory
    homography supervision): kp0 warped by H vs kp1, mutual nearest
    within th px -> positive; else unmatched (-1). Invalid (padded)
    keypoints are unmatchable but excluded from the negatives too
    (marked -2, ignored by the loss weights)."""
    M, N = len(kp0), len(kp1)
    warped0 = warp_points_np(kp0, H)
    d = np.linalg.norm(warped0[:, None] - kp1[None], axis=-1)
    d = np.where(mask0[:, None] & mask1[None], d, np.inf)
    nn0 = d.argmin(1)
    nn1 = d.argmin(0)
    min0 = d.min(1) if N else np.full(M, np.inf)
    mutual = np.arange(M) == nn1[nn0]
    pos = mutual & (min0 < th)

    assignment = np.zeros((M, N), np.float32)
    assignment[np.arange(M)[pos], nn0[pos]] = 1.0
    gt_m0 = np.where(pos, nn0, -1)
    gt_m1 = np.full(N, -1, np.int64)
    gt_m1[nn0[pos]] = np.arange(M)[pos]
    # padded keypoints: ignore entirely (-2 => neither pos nor dustbin)
    gt_m0 = np.where(mask0, gt_m0, -2)
    gt_m1 = np.where(mask1, gt_m1, -2)
    return assignment, gt_m0, gt_m1
