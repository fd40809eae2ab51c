"""Self-supervised keypoint losses (loc / descriptor-triplet / USP score / IO).

Behavioral contract (reference: src/kp2dtiny/models/KeypointNetwithIOLoss.py):

- warp_coords_homography == _warp_homography_batch (:928-957): apply a 3x3
  homography to normalized uv coords with perspective divide.
- loc loss (:448-455): pairwise L2 between warped source coords and target
  coords over all cells, per-source min; masked mean over (min < 4px) &
  interior cells.
- descriptor triplet loss == build_descriptor_loss (:25-154): sample dense
  descriptors at source coords / warped source coords, L2-normalize (with
  the reference's eps-in-norm quirk :104-105), sqrt(2-2cos) distance matrix,
  hardest-negative mining outside a relax_field box, torch-style
  triplet_margin_loss (margin 0.2, p=2, mean reduction); recall = exact
  NN match rate.
- USP score loss (:486-520): (s_tgt_assoc + s_src) * (d - mean(d)) over
  valid cells + 2 * MSE(resampled target score, source score) over interior.
- IO loss == _compute_io_loss (:783-878): bottom-K scoring cells
  (topk largest=False, :800-812), descriptor NN association, InlierNet
  prediction vs geometric inlier label (2*(err<4px)-1), MSE gated by
  (#inliers > 10).

TPU-first notes: the reference's per-image Python loops and boolean-mask
indexing become batched fixed-shape ops. The interior-cell mask is static
((Hc-2)*(Wc-2) cells), so descriptor mining runs on statically sliced
interiors; the valid-distance masks use masked means instead of ragged
indexing. Everything jits into the single training-step XLA program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_bilinear

Array = jnp.ndarray


def normalize_uv(coords: Array, H: int, W: int) -> Array:
    """Image coords (..., 2) -> normalized [-1, 1] (:960-965)."""
    x = coords[..., 0] / ((W - 1) / 2.0) - 1.0
    y = coords[..., 1] / ((H - 1) / 2.0) - 1.0
    return jnp.stack([x, y], axis=-1)


def denormalize_uv(coords: Array, H: int, W: int) -> Array:
    x = (coords[..., 0] + 1.0) * ((W - 1) / 2.0)
    y = (coords[..., 1] + 1.0) * ((H - 1) / 2.0)
    return jnp.stack([x, y], axis=-1)


def warp_coords_homography(coords: Array, homography: Array) -> Array:
    """coords (B, ..., 2) normalized, homography (B, 3, 3) -> warped coords."""
    B = coords.shape[0]
    lead = coords.shape[1:-1]
    pts = coords.reshape(B, -1, 2)
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    homo = jnp.concatenate([pts, ones], axis=-1)  # (B, N, 3)
    warped = jnp.einsum("bnc,bdc->bnd", homo, homography)
    warped = warped[..., :2] / warped[..., 2:3]
    return warped.reshape((B,) + lead + (2,))


def _interior(x: Array) -> Array:
    """Static interior slice over the two cell dims of (B, Hc, Wc, ...)."""
    return x[:, 1:-1, 1:-1]


def masked_mean(x: Array, mask: Array, eps: float = 1e-12) -> Array:
    # broadcast FIRST so numerator and denominator count the same
    # elements — a (1,Hc,Wc) mask against (B,Hc,Wc) values would
    # otherwise inflate the mean by B
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + eps)


def safe_norm(x: Array, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> Array:
    """L2 norm with a finite gradient at x == 0.

    torch.norm has a zero subgradient at the origin (which the reference
    relies on, e.g. KeypointNetwithIOLoss.py:827-832); jnp.linalg.norm's
    gradient there is 0/0 = NaN — observed as systematic NaN gradients in
    bf16 training once descriptors/coords start coinciding exactly."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
                    + eps)


def descriptor_loss(source_feat: Array, target_feat: Array,
                    source_uv_norm: Array, source_uv_warped_norm: Array,
                    source_uv_warped: Array, relax_field: int = 4,
                    margin: float = 0.2, epsilon: float = 1e-8,
                    ) -> Tuple[Array, Array]:
    """Per-pixel triplet loss + recall over interior cells.

    source_feat/target_feat: (B, Hf, Wf, C) dense maps (NHWC).
    source_uv_norm / source_uv_warped_norm: (B, Hc, Wc, 2) normalized.
    source_uv_warped: (B, Hc, Wc, 2) unnormalized image coords.
    """
    B, Hc, Wc, _ = source_uv_norm.shape
    C = source_feat.shape[-1]
    f32 = jnp.float32
    source_feat = source_feat.astype(f32)
    target_feat = target_feat.astype(f32)
    source_uv_norm = source_uv_norm.astype(f32)
    source_uv_warped_norm = source_uv_warped_norm.astype(f32)
    source_uv_warped = source_uv_warped.astype(f32)

    src_pts = _interior(source_uv_norm).reshape(B, -1, 2)
    tgt_pts = _interior(source_uv_warped_norm).reshape(B, -1, 2)
    tgt_raw = _interior(source_uv_warped).reshape(B, -1, 2)
    M = src_pts.shape[1]

    ref_desc = grid_sample_bilinear(source_feat, src_pts)  # (B, M, C)
    tar_desc = grid_sample_bilinear(target_feat, tgt_pts)

    # reference normalization quirk: norm(x + eps) + eps (:104-105)
    def ref_norm(d):
        n = safe_norm(d + epsilon, axis=-1, keepdims=True)
        return d / (n + epsilon)

    ref_desc = ref_norm(ref_desc)
    tar_desc = ref_norm(tar_desc)

    dmat = jnp.einsum("bmc,bnc->bmn", ref_desc, tar_desc,
                      preferred_element_type=jnp.float32)
    # distance floor via max() instead of the reference's clamp(cos)+eps
    # (:107): on TPU the backward of sqrt(2-2*clip(cos)+eps) produces NaN
    # when the bf16-sourced cosine numerically exceeds 1 (verified at a
    # captured failing training state); max() keeps the gradient finite
    # and the values identical for all cos <= 1 - eps/2
    dmat = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dmat, 1e-6))

    nn_idx = jnp.argmin(dmat, axis=2)  # (B, M)
    # recall: nearest neighbor lands exactly on the true position
    nn_xy = jnp.take_along_axis(tgt_raw, nn_idx[..., None], axis=1)
    exact = (jnp.abs(nn_xy[..., 0] - tgt_raw[..., 0]) == 0) & \
            (jnp.abs(nn_xy[..., 1] - tgt_raw[..., 1]) == 0)
    recall = jnp.mean(exact.astype(jnp.float32))

    # hardest negative outside the relax_field box around the true position
    dx = jnp.abs(tgt_raw[..., None, 0] - tgt_raw[..., None, :, 0])  # (B,M,M)
    dy = jnp.abs(tgt_raw[..., None, 1] - tgt_raw[..., None, :, 1])
    correct_box = (dx <= relax_field) & (dy <= relax_field)
    dmat_masked = jnp.where(correct_box, 2.0, dmat)
    neg_idx = jnp.argmin(dmat_masked, axis=2)  # (B, M)
    neg_desc = jnp.take_along_axis(tar_desc, neg_idx[..., None], axis=1)

    # torch triplet_margin_loss: relu(||a-p|| - ||a-n|| + margin).mean(),
    # with torch's pairwise_distance eps=1e-6 added per-element
    eps_pd = 1e-6
    d_pos = safe_norm(ref_desc - tar_desc + eps_pd, axis=-1)
    d_neg = safe_norm(ref_desc - neg_desc + eps_pd, axis=-1)
    loss = jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))
    return loss, recall


def keypoint_losses(out: Dict[str, Array], out_aug: Dict[str, Array],
                    homography: Array, H: int, W: int,
                    relax_field: int = 4) -> Dict[str, Array]:
    """loc + USP-score components (descriptor/IO handled separately).

    out/out_aug are post-processed dicts: score (B,Hc,Wc,1) border-masked,
    coord (B,Hc,Wc,2) decoded image coords, feat dense (B,Hf,Wf,C).
    The aug view is the SOURCE and the clean view the TARGET
    (KeypointNetwithIOLoss.py:425-431).
    """
    # loss math in f32 regardless of the model compute dtype: in bf16,
    # decoded coords quantize onto identical values, making pairwise
    # distances exactly 0 and the sqrt gradient NaN (observed in training)
    f32 = jnp.float32
    source_score = out_aug["score"].astype(f32)
    source_uv = out_aug["coord"].astype(f32)
    target_score = out["score"].astype(f32)
    target_uv = out["coord"].astype(f32)
    B, Hc, Wc, _ = target_score.shape

    target_uv_norm = normalize_uv(target_uv, H, W)
    source_uv_norm = normalize_uv(source_uv, H, W)
    source_uv_warped_norm = warp_coords_homography(source_uv_norm, homography)
    source_uv_warped = denormalize_uv(source_uv_warped_norm, H, W)

    # interior-cell mask (border cells excluded), static pattern
    border = jnp.zeros((Hc, Wc), bool).at[1:-1, 1:-1].set(True)
    border_flat = border.reshape(1, Hc * Wc)

    # pairwise L2 between warped source and target predictions (:985-991)
    src = source_uv_warped.reshape(B, Hc * Wc, 2)
    tgt = target_uv.reshape(B, Hc * Wc, 2)
    d2 = jnp.sum(jnp.square(src[:, :, None] - tgt[:, None, :]), axis=-1)
    # d2 can be EXACTLY 0 (coincident predictions); sqrt has an infinite
    # gradient there, so keep a floor inside the sqrt
    dmat = jnp.sqrt(jnp.maximum(d2, 1e-12))
    d_min = jnp.min(dmat, axis=2)  # (B, HcWc)
    d_min_idx = jnp.argmin(dmat, axis=2)

    valid = (d_min < 4.0) & border_flat
    loc_loss = masked_mean(d_min, valid)

    # USP score loss (:486-504)
    tgt_score_flat = target_score.reshape(B, Hc * Wc)
    tgt_assoc = jnp.take_along_axis(tgt_score_flat, d_min_idx, axis=1)
    src_score_flat = source_score.reshape(B, Hc * Wc)
    loc_err_mean = masked_mean(d_min, valid)
    usp = (tgt_assoc + src_score_flat) * (d_min - loc_err_mean)
    usp_loss = masked_mean(usp, valid)

    # resampled-score MSE over interior cells (:506-520); the reference
    # detaches the sampling coordinates (:506-511)
    tgt_score_resampled = grid_sample_bilinear(
        target_score, jax.lax.stop_gradient(source_uv_warped_norm))
    mse = jnp.square(tgt_score_resampled - source_score)[..., 0]
    # the mask must be broadcast to the FULL (B,Hc,Wc) shape: with
    # border[None] alone, masked_mean's denominator misses the batch
    # factor and the term comes out B-times too strong — found root-causing
    # the 0.7 score-calibration drift against the reference trainer
    # (the overweighted consistency term suppressed the USP dynamics that
    # push good cells' scores up; tools/score_probe.py)
    score_mse = masked_mean(mse, border[None])

    return {
        "loc_loss": loc_loss,
        "usp_loss": usp_loss,
        "score_mse": score_mse,
        "source_uv_norm": source_uv_norm,
        "source_uv_warped_norm": source_uv_warped_norm,
        "source_uv_warped": source_uv_warped,
        "target_uv_norm": target_uv_norm,
    }


def io_loss(source_score: Array, source_feat: Array, target_feat: Array,
            target_score: Array, source_uv_norm: Array, target_uv_norm: Array,
            source_uv_warped_norm: Array, H: int, W: int,
            io_net_apply, io_net_params, top_k: int = 300,
            epsilon: float = 1e-8) -> Array:
    """IO-Net loss (:783-878). io_net_apply(params, point_pair) -> logits.

    point_pair: (B, K, 5) = [src_uv_norm, associated_tgt_uv_norm, desc_dist].
    """
    f32 = jnp.float32
    source_score = source_score.astype(f32)
    target_score = target_score.astype(f32)
    source_feat = source_feat.astype(f32)
    target_feat = target_feat.astype(f32)
    B, Hc, Wc, _ = source_uv_norm.shape

    def bottom_k_sorted(score_flat):
        # reference: topk(largest=False) then boolean-mask gather, which
        # yields ROW-MAJOR (sorted-index) order (:800-818)
        neg_s, idx = jax.lax.top_k(-score_flat, top_k)
        return jnp.sort(idx, axis=1)

    idx1 = bottom_k_sorted(source_score.reshape(B, Hc * Wc))
    idx2 = bottom_k_sorted(target_score.reshape(B, Hc * Wc))

    def gather_pts(pts, idx):
        return jnp.take_along_axis(pts.reshape(B, Hc * Wc, 2),
                                   idx[..., None], axis=1)

    src_uv_topk = gather_pts(source_uv_norm, idx1)
    tgt_uv_topk = gather_pts(target_uv_norm, idx2)
    src_warped_topk = gather_pts(source_uv_warped_norm, idx1)

    src_desc = grid_sample_bilinear(source_feat, src_uv_topk)
    tgt_desc = grid_sample_bilinear(target_feat, tgt_uv_topk)
    src_desc = src_desc / (safe_norm(src_desc, axis=-1, keepdims=True)
                           + epsilon)
    tgt_desc = tgt_desc / (safe_norm(tgt_desc, axis=-1, keepdims=True)
                           + epsilon)

    dmat = jnp.einsum("bkc,bmc->bkm", src_desc, tgt_desc,
                      preferred_element_type=jnp.float32)
    # see descriptor_loss: max()-floored distance keeps the TPU backward
    # finite when cos numerically exceeds 1 (:834-835 reference clamp)
    dmat = jnp.sqrt(jnp.maximum(2.0 - 2.0 * dmat, 1e-6))
    dmat_min = jnp.min(dmat, axis=2)
    dmat_idx = jnp.argmin(dmat, axis=2)

    tgt_assoc = jnp.take_along_axis(tgt_uv_topk, dmat_idx[..., None], axis=1)
    point_pair = jnp.concatenate(
        [src_uv_topk, tgt_assoc, dmat_min[..., None]], axis=-1)  # (B, K, 5)

    inlier_pred = io_net_apply(io_net_params, point_pair)  # (B, K)

    tgt_assoc_raw = denormalize_uv(tgt_assoc, H, W)
    src_warped_raw = denormalize_uv(src_warped_topk, H, W)
    match_err = safe_norm(tgt_assoc_raw - src_warped_raw, axis=-1)
    inlier_mask = match_err < 4.0
    inlier_gt = 2.0 * inlier_mask.astype(jnp.float32) - 1.0

    gate = (jnp.sum(inlier_mask) > 10).astype(jnp.float32)
    return gate * jnp.mean(jnp.square(inlier_pred - inlier_gt))
