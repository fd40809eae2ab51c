"""Batch-hard triplet loss for global descriptors.

Behavioral contract (reference: src/kp2dtiny/utils/losses.py:9-152):
- pairwise Euclidean distance matrix via the Gram-matrix identity with
  relu clamping and the zero-distance eps trick (:86-100)
- hardest mode (used by the trainer, KeypointNetwithIOLoss.py:255-257):
  per-anchor max positive distance, min negative distance (negatives
  masked by adding the row max), loss = mean(relu(dp - dn + 0.1))
  — note the margin inside relu is the hardcoded 0.1 of the reference
  (losses.py:59), NOT the constructor margin.
- non-hardest mode: all-valid-triplet mean over positive losses.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_distance(x: jnp.ndarray, squared: bool = False,
                      eps: float = 1e-16) -> jnp.ndarray:
    cor = x @ x.T
    norm = jnp.diag(cor)
    d = norm[:, None] - 2 * cor + norm[None, :]
    d = jnp.maximum(d, 0.0)
    if not squared:
        zero_mask = (d == 0.0).astype(d.dtype)
        d = jnp.sqrt(d + zero_mask * eps) * (1.0 - zero_mask)
    return d


def hard_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                      margin: float = 0.1, hardest: bool = True,
                      squared: bool = False) -> jnp.ndarray:
    """embeddings (N, D), labels (N,) int."""
    d = pairwise_distance(embeddings, squared=squared)
    n = labels.shape[0]
    eye = jnp.eye(n, dtype=bool)
    same = labels[None, :] == labels[:, None]

    if hardest:
        pos_mask = (same & ~eye).astype(d.dtype)
        hardest_pos = jnp.max(d * pos_mask, axis=1, keepdims=True)
        neg_mask = (~same).astype(d.dtype)
        row_max = jnp.max(d, axis=1, keepdims=True)
        anchor_neg = d + row_max * (1.0 - neg_mask)
        hardest_neg = jnp.min(anchor_neg, axis=1, keepdims=True)
        # reference uses a hardcoded 0.1 margin here (losses.py:59)
        return jnp.mean(jnp.maximum(hardest_pos - hardest_neg + 0.1, 0.0))

    anc_pos = d[:, :, None]
    anc_neg = d[:, None, :]
    loss = anc_pos - anc_neg + margin
    i_ne_j = ~eye[:, :, None]
    i_ne_k = ~eye[:, None, :]
    j_ne_k = ~eye[None, :, :]
    valid = (same[:, :, None] & ~same[:, None, :]
             & i_ne_j & i_ne_k & j_ne_k)
    loss = jnp.maximum(loss * valid.astype(loss.dtype), 0.0)
    n_hard = jnp.sum((loss > 1e-16).astype(loss.dtype))
    return jnp.sum(loss) / (n_hard + 1e-16)


def global_descriptor_loss(pred: jnp.ndarray, pred_aug: jnp.ndarray
                           ) -> jnp.ndarray:
    """Trainer VPR loss (_hard_global_descriptor_loss,
    KeypointNetwithIOLoss.py:919-926): stack (pred, pred_aug) with paired
    labels and run batch-hard mining."""
    n = pred.shape[0]
    labels = jnp.concatenate([jnp.arange(n), jnp.arange(n)])
    embeds = jnp.concatenate([pred, pred_aug], axis=0)
    return hard_triplet_loss(embeds, labels, hardest=True)
