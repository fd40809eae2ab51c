"""Depth losses: SILog + Huber (+ warped-consistency MSE in the trainer).

Behavioral contract (reference: src/kp2dtiny/utils/losses.py:176-192 SILog,
KeypointNetwithIOLoss.py:907-917): depth loss = SILog(pred, gt, mask=gt>0)
+ Huber(pred[mask], gt[mask]) * huber_factor. SILog uses torch.var
(unbiased) over the masked elements: 10*sqrt(var(g) + 0.15*mean(g)^2),
g = log(pred) - log(gt).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _masked_moments(x: Array, mask: Array):
    m = mask.astype(x.dtype)
    n = jnp.sum(m)
    mean = jnp.sum(x * m) / jnp.maximum(n, 1.0)
    var_biased = jnp.sum(jnp.square(x - mean) * m) / jnp.maximum(n, 1.0)
    # torch.var uses Bessel's correction (unbiased)
    var = var_biased * n / jnp.maximum(n - 1.0, 1.0)
    return mean, var, n


def silog_loss(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    if mask is None:
        mask = jnp.ones_like(gt, bool)
    safe_pred = jnp.where(mask, pred, 1.0)
    safe_gt = jnp.where(mask, gt, 1.0)
    g = jnp.log(safe_pred) - jnp.log(safe_gt)
    mean, var, _ = _masked_moments(g, mask)
    return 10.0 * jnp.sqrt(var + 0.15 * jnp.square(mean))


def huber_loss(pred: Array, gt: Array, mask: Array | None = None,
               delta: float = 1.0) -> Array:
    if mask is None:
        mask = jnp.ones_like(gt, bool)
    d = jnp.abs(pred - gt)
    per = jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def depth_loss(pred: Array, gt: Array, huber_factor: float = 1.0) -> Array:
    """(KeypointNetwithIOLoss.py:907-917); pred/gt (B, H, W, 1), same size
    (the reference interpolates pred to gt's size; our data pipeline emits
    matching resolutions)."""
    mask = gt > 0.0
    return silog_loss(pred, gt, mask) + huber_loss(pred, gt, mask) * huber_factor
