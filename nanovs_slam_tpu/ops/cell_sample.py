"""Gather-free dense formulation of per-cell descriptor sampling.

The inference postprocess samples the dense descriptor map (at skip
resolution Hf = 2*Hc) at each cell's decoded keypoint coordinate
(kp2dtiny.py:627-631). Because decoded coords are confined to
cell_center ± cross_ratio*(cell-1)/2 and the feat map has exactly 2x the
cell-grid resolution, every bilinear tap for cell (i, j) lies inside the
feat-pixel window rows [2i-2, 2i+3], cols [2j-2, 2j+3] (bound derived
from px = coord * (Wf-1)/(W-1); see kernel docstring).

This lets bilinear sampling be computed as a 36-tap HAT-WEIGHTED STENCIL:

    out(i,j,c) = sum_{a,b in [-2..3]} relu(1-|py-(2i+a)|) *
                                      relu(1-|px-(2j+b)|) * feat(2i+a, 2j+b, c)

(the hat function relu(1-|d|) IS the bilinear kernel, and it vanishes on
all but the 4 true taps) — no gathers, only shifted stride-2 slices and
VPU FMAs, which XLA/Mosaic vectorize perfectly on TPU. Out-of-range taps
carry zero weight, matching torch grid_sample zero padding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# tap window in feat pixels relative to 2*cell_index
TAP_OFFSETS = (-2, -1, 0, 1, 2, 3)


def feat_pixel_coords(coord: Array, H: int, W: int, Hf: int, Wf: int
                      ) -> Tuple[Array, Array]:
    """Image coords -> feat-map pixel coords under align_corners=True:
    px = x/(W-1)*(Wf-1)."""
    px = coord[..., 0] * ((Wf - 1) / (W - 1))
    py = coord[..., 1] * ((Hf - 1) / (H - 1))
    return px, py


def sample_cell_descriptors_dense(feat: Array, coord: Array, H: int, W: int,
                                  normalize: bool = True) -> Array:
    """feat (B, Hf, Wf, C) with Hf == 2*Hc; coord (B, Hc, Wc, 2) image
    coords -> (B, Hc, Wc, C), bilinear align-corners sampled (+L2 norm).
    Equivalent to ops.grid_sample.sample_descriptors on the cell grid."""
    B, Hf, Wf, C = feat.shape
    _, Hc, Wc, _ = coord.shape
    assert Hf == 2 * Hc and Wf == 2 * Wc, (feat.shape, coord.shape)

    px, py = feat_pixel_coords(coord, H, W, Hf, Wf)  # (B, Hc, Wc)

    # pad feat by the window extent: rows/cols [-2 .. 2*(n-1)+3]
    pad_lo, pad_hi = 2, 3
    fpad = jnp.pad(feat, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi),
                          (0, 0)))

    # base cell positions
    jj = jnp.arange(Wc, dtype=px.dtype)[None, None, :] * 2.0
    ii = jnp.arange(Hc, dtype=py.dtype)[None, :, None] * 2.0

    out = jnp.zeros((B, Hc, Wc, C), feat.dtype)
    for a in TAP_OFFSETS:
        wy = jnp.maximum(1.0 - jnp.abs(py - (ii + a)), 0.0)
        row_ok = ((ii + a) >= 0) & ((ii + a) <= Hf - 1)
        wy = jnp.where(row_ok, wy, 0.0)
        # stride-2 slice of padded feat at row offset a
        rows = fpad[:, pad_lo + a: pad_lo + a + 2 * Hc: 2]
        for b in TAP_OFFSETS:
            wx = jnp.maximum(1.0 - jnp.abs(px - (jj + b)), 0.0)
            col_ok = ((jj + b) >= 0) & ((jj + b) <= Wf - 1)
            wx = jnp.where(col_ok, wx, 0.0)
            w = (wy * wx).astype(feat.dtype)
            tap = rows[:, :, pad_lo + b: pad_lo + b + 2 * Wc: 2]
            out = out + w[..., None] * tap

    if normalize:
        dn = jnp.linalg.norm(out.astype(jnp.float32), axis=-1, keepdims=True)
        out = (out.astype(jnp.float32) / jnp.maximum(dn, 1e-12)).astype(
            feat.dtype)
    return out
