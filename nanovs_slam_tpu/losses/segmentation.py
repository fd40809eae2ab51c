"""Segmentation losses: cross-entropy (ignore 255) + multiclass Dice.

Behavioral contract (reference: KeypointNetwithIOLoss.py:237,252-254,880-884):
seg loss = CE(ignore_index=255) * 0.5 + Dice(multiclass, ignore 255) * 1.5,
applied to both views with 0.5 weight each. The Dice follows
segmentation_models_pytorch semantics: per-class soft dice over
(batch, space) dims, smooth=0, eps=1e-7, classes absent from the GT zeroed,
mean over classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def cross_entropy_loss(logits: Array, labels: Array,
                       ignore_index: int = 255) -> Array:
    """logits (B, H, W, C); labels (B, H, W) int. Mean over non-ignored."""
    C = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    m = valid.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def dice_loss(logits: Array, labels: Array, ignore_index: int = 255,
              smooth: float = 0.0, eps: float = 1e-7) -> Array:
    """Multiclass soft Dice (smp.losses.DiceLoss semantics)."""
    B = logits.shape[0]
    C = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1).reshape(B, -1, C)
    labels_flat = labels.reshape(B, -1)
    valid = (labels_flat != ignore_index)
    safe = jnp.where(valid, labels_flat, 0)
    onehot = jax.nn.one_hot(safe, C, dtype=probs.dtype)
    onehot = onehot * valid[..., None].astype(probs.dtype)
    probs = probs * valid[..., None].astype(probs.dtype)

    inter = jnp.sum(probs * onehot, axis=(0, 1))  # per class
    card = jnp.sum(probs + onehot, axis=(0, 1))
    dice = (2.0 * inter + smooth) / jnp.maximum(card + smooth, eps)
    loss = 1.0 - dice
    present = (jnp.sum(onehot, axis=(0, 1)) > 0).astype(loss.dtype)
    return jnp.mean(loss * present)


def segmentation_loss(logits: Array, labels: Array,
                      ignore_index: int = 255) -> Array:
    """CE*0.5 + Dice*1.5 (KeypointNetwithIOLoss.py:880-884)."""
    return (cross_entropy_loss(logits, labels, ignore_index) * 0.5
            + dice_loss(logits, labels, ignore_index) * 1.5)
