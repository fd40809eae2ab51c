"""LightGlue NLL training loss with per-layer deep supervision.

Behavioral contract (reference: lightglue/lightglue.py:10-77, 646-695):
- gt weights: positive entries from gt_assignment, unmatched rows/cols
  (gt_matches == -1) weight the dustbin column/row (:66-77).
- weight_loss: nll_pos averaged over #positives, nll_neg over #negatives
  (:10-29); nll = balancing * pos + (1 - balancing) * neg (:50-52).
- total: final layer + earlier layers re-assigned with shared gt weights,
  weighted by gamma**(N-i-1), normalized by the weight sum (:655-684);
  TokenConfidence BCE supervision toward the final assignment (:187-200).
- matcher metrics (recall/precision/accuracy, :80-125).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def gt_weights_from_matches(log_assignment_shape, gt_assignment: Array,
                            gt_matches0: Array, gt_matches1: Array) -> Array:
    B, Mp1, Np1 = log_assignment_shape
    M, N = Mp1 - 1, Np1 - 1
    weights = jnp.zeros((B, Mp1, Np1), jnp.float32)
    weights = weights.at[:, :M, :N].set(gt_assignment.astype(jnp.float32))
    weights = weights.at[:, :M, -1].set((gt_matches0 == -1).astype(jnp.float32))
    weights = weights.at[:, -1, :N].set((gt_matches1 == -1).astype(jnp.float32))
    return weights


def weight_loss(log_assignment: Array, weights: Array
                ) -> Tuple[Array, Array, Array, Array]:
    B, Mp1, Np1 = log_assignment.shape
    m, n = Mp1 - 1, Np1 - 1
    loss_sc = log_assignment * weights
    num_neg0 = jnp.clip(weights[:, :m, -1].sum(-1), min=1.0)
    num_neg1 = jnp.clip(weights[:, -1, :n].sum(-1), min=1.0)
    num_pos = jnp.clip(weights[:, :m, :n].sum((-1, -2)), min=1.0)
    nll_pos = -loss_sc[:, :m, :n].sum((-1, -2)) / num_pos
    nll_neg0 = -loss_sc[:, :m, -1].sum(-1)
    nll_neg1 = -loss_sc[:, -1, :n].sum(-1)
    nll_neg = (nll_neg0 + nll_neg1) / (num_neg0 + num_neg1)
    return nll_pos, nll_neg, num_pos, (num_neg0 + num_neg1) / 2.0


def nll_loss(log_assignment: Array, weights: Array,
             nll_balancing: float = 0.5) -> Tuple[Array, Dict[str, Array]]:
    nll_pos, nll_neg, num_pos, num_neg = weight_loss(log_assignment, weights)
    nll = nll_balancing * nll_pos + (1.0 - nll_balancing) * nll_neg
    return nll, {"nll_pos": nll_pos, "nll_neg": nll_neg,
                 "num_matchable": num_pos, "num_unmatchable": num_neg}


def confidence_loss(token_logit0: Array, token_logit1: Array,
                    la_now: Array, la_final: Array) -> Array:
    """TokenConfidence BCE supervision (:187-200); token_logit* are the
    PRE-sigmoid logits."""
    la_now = jax.lax.stop_gradient(la_now)
    la_final = jax.lax.stop_gradient(la_final)
    correct0 = (jnp.argmax(la_final[:, :-1, :], -1)
                == jnp.argmax(la_now[:, :-1, :], -1)).astype(jnp.float32)
    correct1 = (jnp.argmax(la_final[:, :, :-1], -2)
                == jnp.argmax(la_now[:, :, :-1], -2)).astype(jnp.float32)

    def bce(logit, target):
        return (jnp.maximum(logit, 0) - logit * target
                + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    return (bce(token_logit0, correct0).mean(-1)
            + bce(token_logit1, correct1).mean(-1)) / 2.0


def matcher_metrics(matches0: Array, gt_matches0: Array,
                    matching_scores0: Array) -> Dict[str, Array]:
    def recall(m, gt_m):
        mask = (gt_m > -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def accuracy(m, gt_m):
        mask = (gt_m >= -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def precision(m, gt_m):
        mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    return {"match_recall": recall(matches0, gt_matches0),
            "match_precision": precision(matches0, gt_matches0),
            "accuracy": accuracy(matches0, gt_matches0)}


def lightglue_loss(model, params, pred: Dict[str, Array],
                   data: Dict[str, Array], n_layers: int,
                   nll_balancing: float = 0.5, gamma: float = 1.0,
                   training: bool = True) -> Dict[str, Array]:
    """Full deep-supervision loss (:646-695). pred must contain
    ref_descriptors0/1 stacked over layers and log_assignment; data must
    contain gt_assignment (B,M,N) and gt_matches0/1."""
    la_final = pred["log_assignment"]
    weights = gt_weights_from_matches(la_final.shape, data["gt_assignment"],
                                      data["gt_matches0"],
                                      data["gt_matches1"])
    nll, metrics = nll_loss(la_final, weights, nll_balancing)
    losses = {"total": nll, "last": jax.lax.stop_gradient(nll), **metrics}
    losses["row_norm"] = jnp.exp(la_final)[:, :-1].sum(2).mean(1)

    from .lightglue import assignment_at_layer

    sum_weights = 1.0
    conf_total = jnp.zeros_like(nll)
    N = pred["ref_descriptors0"].shape[1]
    for i in range(N - 1):
        la_i = assignment_at_layer(
            params, i, pred["ref_descriptors0"][:, i],
            pred["ref_descriptors1"][:, i], data.get("mask0"),
            data.get("mask1"))
        nll_i, _ = nll_loss(la_i, weights, nll_balancing)
        w = gamma ** (N - i - 1) if gamma > 0 else i + 1
        sum_weights += w
        losses["total"] = losses["total"] + nll_i * w

        # confidence supervision
        tc_params = params[f"token_confidence_{i}"]["token"]
        def logit(desc):
            return (jax.lax.stop_gradient(desc) @ tc_params["kernel"]
                    + tc_params["bias"])[..., 0]
        conf_total = conf_total + confidence_loss(
            logit(pred["ref_descriptors0"][:, i]),
            logit(pred["ref_descriptors1"][:, i]),
            la_i, la_final) / (N - 1)

    losses["total"] = losses["total"] / sum_weights
    losses["confidence"] = conf_total
    if training:
        losses["total"] = losses["total"] + conf_total
    return losses
