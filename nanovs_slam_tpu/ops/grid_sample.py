"""Bilinear/nearest grid sampling with torch align_corners=True parity.

The reference uses torch.nn.functional.grid_sample(align_corners=True) to
sample dense descriptor maps at keypoint locations (kp2dtiny.py:627-631),
to resample scores in the USP loss (KeypointNetwithIOLoss.py:506-511) and
descriptors in the triplet loss (:66-100). JAX has no native grid_sample;
this is the XLA formulation (gather + lerp). A fused Pallas kernel for the
inference hot path lives in ops/pallas/.

Semantics (align_corners=True, padding_mode='zeros'):
  pixel = (norm + 1) / 2 * (size - 1)
  out-of-range corners contribute 0 (handled by zeroing weights of OOB taps).
Coordinates exactly on the valid range sample normally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); ix, iy: (N,) int32 clipped indices -> (N, C)."""
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def _grid_sample_one(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                     mode: str) -> jnp.ndarray:
    """img (H, W, C), px/py (N,) float pixel coords -> (N, C)."""
    H, W, C = img.shape
    if mode == "nearest":
        # torch nearest rounds half away from zero? It uses round-to-nearest
        # (floor(x+0.5)) on the unnormalized coordinate.
        ix = jnp.clip(jnp.floor(px + 0.5).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.floor(py + 0.5).astype(jnp.int32), 0, H - 1)
        valid = ((px >= -0.5) & (px <= W - 0.5) &
                 (py >= -0.5) & (py <= H - 0.5)).astype(img.dtype)
        return _gather_2d(img, ix, iy) * valid[:, None]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0).astype(img.dtype)
    wy = (py - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        v = _gather_2d(img, jnp.clip(xi, 0, W - 1), jnp.clip(yi, 0, H - 1))
        return v * inb.astype(img.dtype)[:, None]

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - wx)[:, None] + v01 * wx[:, None]
    bot = v10 * (1 - wx)[:, None] + v11 * wx[:, None]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                mode: str = "bilinear") -> jnp.ndarray:
    """NHWC grid sample with align_corners=True, zeros padding.

    img:  (B, H, W, C)
    grid: (B, ..., 2) normalized coords in [-1, 1], [..., 0] = x, [..., 1] = y
    returns (B, ..., C)
    """
    B, H, W, C = img.shape
    lead = grid.shape[1:-1]
    g = grid.reshape(B, -1, 2)
    px = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    py = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    out = jax.vmap(lambda im, x, y: _grid_sample_one(im, x, y, mode))(
        img, px, py)
    return out.reshape((B,) + lead + (C,))


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    return grid_sample(img, grid, "bilinear")


def grid_sample_nearest(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    return grid_sample(img, grid, "nearest")


def sample_descriptors(feat: jnp.ndarray, coords: jnp.ndarray, H: int,
                       W: int, normalize: bool = True) -> jnp.ndarray:
    """Sample a dense descriptor map at image coordinates and L2-normalize.

    Matches KP2DTinyV2.sample_feat (kp2dtiny.py:627-631): coords are IMAGE
    coordinates; normalization maps them to [-1,1] over (W-1, H-1)
    (normalize_coord, :642-647), then align_corners=True sampling onto the
    feature map at any resolution.

    feat:   (B, Hf, Wf, C)
    coords: (B, ..., 2) image coords, [..., 0] = x in [0, W-1]
    returns (B, ..., C)
    """
    gx = coords[..., 0] / ((W - 1) / 2.0) - 1.0
    gy = coords[..., 1] / ((H - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample_bilinear(feat, grid)
    if normalize:
        # reference divides by the raw norm (no eps; kp2dtiny.py:629-631)
        dn = jnp.linalg.norm(out, axis=-1, keepdims=True)
        out = out / jnp.maximum(dn, 1e-12)
    return out
