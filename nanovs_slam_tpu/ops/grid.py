"""Cell-grid keypoint coordinate decoding.

Behavioral contract (reference: src/kp2dtiny/models/kp2dtiny.py:520-614 and
src/kp2dtiny/utils/image.py:8-75):
- image_grid produces per-cell integer coordinates with channel 0 = x (col)
  and channel 1 = y (row).
- coord = grid * cell + step + tanh_shift * cross_ratio * step with
  step = (cell - 1) / 2; x clamped to [0, W-1], y to [0, H-1].
- remove_border zeroes a 1-cell frame of the score map (:520-528).

In JAX the grid is a compile-time constant folded into the jitted program
(the reference lru_caches it per (B,H,W,device), image.py:8-44).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def image_grid(Hc: int, Wc: int, dtype=jnp.float32) -> jnp.ndarray:
    """(Hc, Wc, 2) grid with [..., 0] = x (column) and [..., 1] = y (row)."""
    ys, xs = np.meshgrid(np.arange(Hc), np.arange(Wc), indexing="ij")
    return jnp.asarray(np.stack([xs, ys], axis=-1), dtype=dtype)


def decode_coords(shift: jnp.ndarray, H: int, W: int, cell: int,
                  cross_ratio: float = 2.0) -> jnp.ndarray:
    """Decode tanh shifts (B, Hc, Wc, 2) into image coordinates (B, Hc, Wc, 2).

    coord = grid*cell + (cell-1)/2 + shift * cross_ratio * (cell-1)/2,
    clamped per-axis (kp2dtiny.py:593-614).
    """
    B, Hc, Wc, _ = shift.shape
    step = (cell - 1) / 2.0
    base = image_grid(Hc, Wc, shift.dtype) * cell + step
    coord = base[None] + shift * (cross_ratio * step)
    x = jnp.clip(coord[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coord[..., 1], 0.0, H - 1.0)
    return jnp.stack([x, y], axis=-1)


def remove_border(score: jnp.ndarray) -> jnp.ndarray:
    """Zero the 1-cell border of the score map (B, Hc, Wc, 1)."""
    B, Hc, Wc, _ = score.shape
    mask = np.ones((Hc, Wc), np.float32)
    mask[0, :] = mask[-1, :] = 0.0
    mask[:, 0] = mask[:, -1] = 0.0
    return score * jnp.asarray(mask, score.dtype)[None, :, :, None]
