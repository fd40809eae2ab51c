"""Additional depth/segmentation loss functions from the reference loss
library (src/kp2dtiny/utils/losses.py:155-318). Most are unused by the
shipped training configs (grad/normal factors are 0.0,
KeypointNetwithIOLoss.py:245-246) but are part of the framework surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def jaccard_distance_loss(y_true: Array, y_pred: Array,
                          smooth: float = 100.0) -> Array:
    """(losses.py:155-172)"""
    intersection = jnp.abs(y_true * y_pred).sum(axis=-1)
    total = jnp.sum(jnp.abs(y_true) + jnp.abs(y_pred), axis=-1)
    jac = (intersection + smooth) / (total - intersection + smooth)
    return (1.0 - jac) * smooth


def rmse_log(pred: Array, gt: Array) -> Array:
    """(losses.py:199-208)"""
    return jnp.sqrt(jnp.mean(jnp.abs(jnp.log(gt) - jnp.log(pred)) ** 2))


def l1(pred: Array, gt: Array) -> Array:
    """(losses.py:211-220): mean |10 gt - 10 pred|."""
    return jnp.mean(jnp.abs(10.0 * gt - 10.0 * pred))


def l1_log(pred: Array, gt: Array) -> Array:
    return jnp.mean(jnp.abs(jnp.log(gt) - jnp.log(pred)))


def rmse(pred: Array, gt: Array) -> Array:
    return jnp.sqrt(jnp.mean(jnp.abs(10.0 * gt - 10.0 * pred) ** 2))


def berhu(pred: Array, gt: Array, threshold: float = 0.2) -> Array:
    """(losses.py:235-255): reverse Huber with data-dependent delta."""
    mask = (gt > 0).astype(pred.dtype)
    pred = pred * mask
    diff = jnp.abs(gt - pred)
    delta = threshold * jnp.max(diff)
    part1 = jnp.where(diff <= delta, diff, 0.0)
    part2 = jnp.where(diff > delta,
                      (diff ** 2 - delta ** 2) / (2.0 * delta) + delta, 0.0)
    return jnp.sum(part1 + part2)


def sobel_gradients(img: Array) -> Tuple[Array, Array]:
    """Sobel gy/gx of a (B, H, W, 1) map (Grad module, losses.py:270-290)."""
    import jax

    fx = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    fy = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    kern = jnp.stack([fy, fx], axis=-1)[:, :, None, :]  # (3,3,1,2)
    out = jax.lax.conv_general_dilated(
        img, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0:1], out[..., 1:2]


def grad_loss(grad_fake: Array, grad_real: Array,
              mask: Optional[Array] = None) -> Array:
    """(losses.py:293-302)"""
    d = jnp.abs(grad_real - grad_fake)
    if mask is not None:
        m = mask.astype(d.dtype)
        return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(d)


def normal_loss(grad_fake: Array, grad_real: Array,
                eps: float = 1e-12) -> Array:
    """(losses.py:305-318): 1 - mean cosine of gradient directions.
    grads: (B, N, 2)."""
    prod = jnp.sum(grad_fake * grad_real, axis=-1)
    fn = jnp.sqrt(jnp.sum(grad_fake ** 2, axis=-1))
    rn = jnp.sqrt(jnp.sum(grad_real ** 2, axis=-1))
    return 1.0 - jnp.mean(prod / jnp.maximum(fn * rn, eps))
