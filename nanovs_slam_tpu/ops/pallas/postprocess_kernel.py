"""Fused inference postprocess as one Pallas TPU kernel.

Fuses the whole KP2DTiny postprocess chain (kp2dtiny.py:593-631):
  border mask -> cell-grid coordinate decode -> bilinear descriptor
  sampling (align_corners=True) -> L2 normalization
into a single VMEM-resident kernel per batch element.

The bilinear gather is computed GATHER-FREE via the hat-weight stencil
(see ops/cell_sample.py): every tap of cell (i, j) lies in feat-pixel rows
2i+[-2..3], cols 2j+[-2..3]. The feat map is phase-split OUTSIDE the
kernel into 4 stride-2 planes so all in-kernel accesses are unit-stride
dynamic slices; the 36 taps run as a fori_loop of VPU FMAs over
channel-first (C, Hc, Wc) blocks — no gather lowering, and only one tap
tensor live at a time (bounded VMEM).

Weight identity: bilinear kernel == hat function relu(1 - |px - col|), so
tap weight w = wy * wx vanishes on the non-contributing 32 of 36 taps;
out-of-range taps are masked (zeros padding, torch parity).

Layout note: channels-FIRST inside the kernel so the 128-lane dim maps to
Wc (60-256 at eval sizes) instead of C (32): ~4x less VMEM padding. The
surrounding jit transposes in/out; XLA fuses those with the producer convs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(score_ref, shift_ref, planes_ref, score_out_ref, coord_out_ref,
            desc_out_ref, *, H, W, Hc, Wc, C, cell, cross_ratio):
    f32 = jnp.float32
    step = (cell - 1) / 2.0
    Hf, Wf = 2 * Hc, 2 * Wc

    ii = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0).astype(f32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1).astype(f32)

    # --- coordinate decode (kp2dtiny.py:593-614) ---
    sx = shift_ref[0, 0].astype(f32)
    sy = shift_ref[0, 1].astype(f32)
    cx = jnp.clip(jj * cell + step + sx * (cross_ratio * step), 0.0, W - 1.0)
    cy = jnp.clip(ii * cell + step + sy * (cross_ratio * step), 0.0, H - 1.0)
    coord_out_ref[0, 0] = cx
    coord_out_ref[0, 1] = cy

    # --- border mask (kp2dtiny.py:520-528) ---
    border = ((ii > 0) & (ii < Hc - 1) & (jj > 0) & (jj < Wc - 1))
    score_out_ref[0] = jnp.where(border, score_ref[0].astype(f32), 0.0)

    # --- descriptor sampling: 36-tap hat stencil over phase planes ---
    px = cx * ((Wf - 1) / (W - 1))
    py = cy * ((Hf - 1) / (H - 1))

    # statically unrolled taps: Mosaic requires static (or 128-aligned)
    # offsets on the lane dim, so the 36 (row, col) offsets are compile-time
    # constants. The accumulator is a local VALUE (vregs), not a
    # read-modify-write of the output ref per tap — measured ~5% faster.
    acc = None
    for a in (-2, -1, 0, 1, 2, 3):  # feat-row offset
        p = (a + 4) % 2
        dy = (a - p) // 2
        wy = jnp.maximum(1.0 - jnp.abs(py - (2.0 * ii + a)), 0.0)
        wy = jnp.where(((2.0 * ii + a) >= 0) & ((2.0 * ii + a) <= Hf - 1),
                       wy, 0.0)
        for b in (-2, -1, 0, 1, 2, 3):  # feat-col offset
            q = (b + 4) % 2
            dx = (b - q) // 2
            wx = jnp.maximum(1.0 - jnp.abs(px - (2.0 * jj + b)), 0.0)
            wx = jnp.where(((2.0 * jj + b) >= 0)
                           & ((2.0 * jj + b) <= Wf - 1), wx, 0.0)
            w = wy * wx  # (Hc, Wc)
            tap = planes_ref[0, p * 2 + q, :,
                             1 + dy: 1 + dy + Hc,
                             1 + dx: 1 + dx + Wc].astype(f32)
            contrib = w[None, :, :] * tap
            acc = contrib if acc is None else acc + contrib

    norm = jnp.sqrt(jnp.sum(acc * acc, axis=0, keepdims=True))
    desc_out_ref[0] = acc / jnp.maximum(norm, 1e-12)


def split_phases_cf(feat: Array) -> Array:
    """(B, 2Hc, 2Wc, C) -> channel-first stride-2 phase planes
    (B, 4, C, Hc+2, Wc+2), plane index = row_phase*2 + col_phase, padded
    spatially by 1 so tap offsets are in-range dynamic slices."""
    B, Hf, Wf, C = feat.shape
    Hc, Wc = Hf // 2, Wf // 2
    planes = feat.reshape(B, Hc, 2, Wc, 2, C).transpose(0, 2, 4, 5, 1, 3)
    planes = planes.reshape(B, 4, C, Hc, Wc)
    return jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))


@functools.partial(jax.jit, static_argnames=("H", "W", "cell", "cross_ratio",
                                             "interpret"))
def fused_postprocess_pallas(score: Array, shift: Array, feat: Array,
                             H: int, W: int, cell: int,
                             cross_ratio: float = 2.0,
                             interpret: bool = False
                             ) -> Tuple[Array, Array, Array]:
    """score (B,Hc,Wc,1), shift (B,Hc,Wc,2) tanh outputs,
    feat (B,2Hc,2Wc,C) dense descriptors ->
    (masked score (B,Hc,Wc,1) f32, coords (B,Hc,Wc,2) f32,
     sampled L2-normed descriptors (B,Hc,Wc,C) f32)."""
    B, Hc, Wc, _ = score.shape
    C = feat.shape[-1]
    planes = split_phases_cf(feat)
    shift_cf = shift.transpose(0, 3, 1, 2)  # (B, 2, Hc, Wc)

    kern = functools.partial(_kernel, H=H, W=W, Hc=Hc, Wc=Wc, C=C,
                             cell=cell, cross_ratio=cross_ratio)
    out_score, out_coord, out_desc = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hc, Wc), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Hc, Wc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, C, Hc + 2, Wc + 2),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hc, Wc), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Hc, Wc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hc, Wc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hc, Wc), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, Hc, Wc), jnp.float32),
            jax.ShapeDtypeStruct((B, C, Hc, Wc), jnp.float32),
        ],
        interpret=interpret,
    )(score[..., 0], shift_cf, planes)
    return (out_score[..., None], out_coord.transpose(0, 2, 3, 1),
            out_desc.transpose(0, 2, 3, 1))
