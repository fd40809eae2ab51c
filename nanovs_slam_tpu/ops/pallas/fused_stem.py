"""EXPERIMENTAL / NEGATIVE RESULT — fused backbone stem as one Pallas
TPU kernel: conv3x3 -> (folded BN) bias -> LeakyReLU -> conv3x3 -> bias
-> LeakyReLU -> 2x2 max-pool, VMEM-resident per row tile.

STATUS: numerically EXACT (parity-tested on real TPU, 5e-7 vs the XLA
chain) but NOT wired into any inference path: it measures 18x SLOWER
than the XLA conv chain it replaces. Root cause (measured, see
STATUS.md "fused-stem negative result"): the phase-split windows have
channel-minor dim 3, and EVERY transfer of such blocks through the TPU
memory system — BlockSpec pipelining, manual DMA, or the XLA producer
fusion — moves (8, 128)-tile-padded data, a 43.7x HBM-traffic
inflation that dwarfs the ~1.6 GB of intermediate traffic the fusion
removes. Channels-first layouts avoid the padding but make the conv
contraction unexpressible as a Mosaic matmul. Kept as a tested
artifact: the kernel-level techniques below are sound and become
profitable the day the toolchain supports sub-128 minor dims without
padding (or bf16 lane concat).

Why it was attempted: XLA executes the stem as 3 HBM round-trips (two
convs + pool) over the LARGEST activations in the network (240x320),
measured at 2.2-2.6x the HBM bandwidth floor and 3.6-13.5% MFU. This
kernel eliminates the intermediate HBM traffic (~1.6 GB at B=128) and
runs each conv as ONE im2col matmul instead of 9 tap matmuls.

Design (every primitive probe-verified on TPU Mosaic):
- PHASE DECOMPOSITION: the image is split into 4 stride-2 phases
  (even/odd rows x cols) OUTSIDE the kernel. In phase space every conv
  tap is a UNIT-stride static slice (Mosaic-legal) and the 2x2 max-pool
  becomes an elementwise max over the 4 phase outputs of conv2 —
  strided gathers (unsupported by Mosaic) never appear.
- IM2COL MATMULS: the 9 taps of a 3x3 conv all sum into the same
  output, so tap slices are concatenated on the channel (lane) dim and
  multiplied by the row-stacked weight (9*Cin, Cout): one MXU pass
  sequence per conv per phase instead of nine (MXU pass count depends
  on M alone while K, N <= 128-ish; 9 separate K=Cin dots cost 9x).
- ROW TILES WITH PREBUILT HALOS: overlapping phase-row windows are
  materialized outside (BlockSpec tiles cannot overlap); the input is
  small (59 MB at B=128) so the duplication is noise against the
  intermediate traffic removed.
- Out-of-range conv positions are masked to ZERO in-kernel: with folded
  BN the bias would otherwise pollute the SAME-padding ring (a plain
  conv has no bias; conv+BN does).

Mosaic findings encoded here (each cost a probe to discover):
- values assembled from lane-sliced matmul partials cannot be
  re-concatenated ("offset mismatch on non-concat dimension") — the
  conv1 results round-trip through a VMEM scratch ref to pin layouts;
- a [0, 0] view of a rank-5 ref carries layout offsets that also break
  concatenation — batch/tile dims are None-squeezed in the BlockSpec;
- bool arrays cannot gain a minor dim ([..., None]) — masks are built
  as 3-D iotas directly;
- bf16 refs + lane concat SIGABRT the compiler — all-f32 in kernel.

Used by the inference fast path (post BN folding, utils/fuse.py);
exact-parity-tested against the flax ConvBNAct chain (reference
AnnotatedConvBnReLUModel, src/kp2dtiny/modules/base.py:14-46 +
encoders.py:110-111 pooling).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _phase_route(p: int, d: int) -> Tuple[int, int]:
    """Full-res offset d in {-1,0,1} from output phase p in {0,1} ->
    (source phase, phase-space offset in {-1,0,1})."""
    sp = (p + d) % 2
    return sp, (p + d - sp) // 2


def _leaky(x: Array) -> Array:
    return jnp.where(x > 0, x, 0.01 * x)


def _im2col_dot(taps, w_ref):
    """concat taps on lanes -> one (M, 9*Cin) @ (9*Cin, Cout) matmul."""
    xc = jnp.concatenate(taps, axis=-1)
    return jax.lax.dot_general(xc, w_ref[...], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(w00_ref, w01_ref, w10_ref, w11_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, o_ref, y1_ref, *, W2: int, H2: int, C1: int, C2: int,
            rt: int):
    """w{pr}{pc}_ref: (rt+4, W2+4, 3) f32 halo window of input phase
    (row_phase, col_phase) — one ref per phase so every tap slice starts
    at lane offset 0, batch/tile dims None-squeezed in the BlockSpec.
    w1_ref (27, C1), w2_ref (9*C1, C2) im2col weights (tap-major);
    o_ref (rt, W2, C2) pooled output tile;
    y1_ref (4, rt+2, W2+2, C1) VMEM scratch."""
    t = pl.program_id(1)
    phases = [w00_ref, w01_ref, w10_ref, w11_ref]
    Wy1 = W2 + 2  # y1 cols cover [-1, W2+1)

    # ---- conv1 (3 -> C1) per output phase ----
    for pr in (0, 1):
        for pc in (0, 1):
            taps = []
            for dy, dx in TAPS:
                spr, orr = _phase_route(pr, dy)
                spc, occ = _phase_route(pc, dx)
                src = phases[spr * 2 + spc]
                # y1 local row r1 in [0, rt+2) = global row (rt*t-1+r1);
                # source window row = r1 + 1 + orr, col = c1 + 1 + occ
                taps.append(src[1 + orr:1 + orr + rt + 2,
                                1 + occ:1 + occ + Wy1, :])
            acc = _leaky(_im2col_dot(taps, w1_ref) + b1_ref[...])
            # zero out-of-range rows/cols (folded-BN bias would pollute
            # the SAME-padding ring); global phase row of local r1 is
            # rt*t - 1 + r1, global col is c1 - 1.
            rr = jax.lax.broadcasted_iota(jnp.int32, (rt + 2, Wy1, 1), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (rt + 2, Wy1, 1), 1)
            grow = rt * t - 1 + rr
            gcol = cc - 1
            ok = ((grow >= 0) & (grow < H2) & (gcol >= 0) & (gcol < W2))
            y1_ref[pr * 2 + pc] = jnp.where(ok, acc, 0.0)

    # ---- conv2 (C1 -> C2) per output phase + pool-by-phase-max ----
    out = None
    for pr in (0, 1):
        for pc in (0, 1):
            taps = []
            for dy, dx in TAPS:
                spr, orr = _phase_route(pr, dy)
                spc, occ = _phase_route(pc, dx)
                ph = spr * 2 + spc
                # y2 local row r2 in [0, rt): y1 local row = r2 + 1 + orr
                taps.append(y1_ref[ph, 1 + orr:1 + orr + rt,
                                   1 + occ:1 + occ + W2, :])
            acc = _leaky(_im2col_dot(taps, w2_ref) + b2_ref[...])
            out = acc if out is None else jnp.maximum(out, acc)

    o_ref[...] = out


def _build_windows(x: Array, rt: int):
    """(B, H, W, 3) -> 4 arrays (B, T, rt+4, W/2+4, 3) f32: overlapping
    halo windows of each stride-2 phase (row_phase*2 + col_phase).
    Built with a row gather (jnp.take): the stack-of-dynamic-slices
    form makes XLA materialize a TILED intermediate (minor dim 3 ->
    43.7x padding, OOM at B=128; measured)."""
    B, H, W, _ = x.shape
    H2, W2 = H // 2, W // 2
    ph = x.reshape(B, H2, 2, W2, 2, 3).transpose(0, 2, 4, 1, 3, 5)
    ph = ph.reshape(B, 4, H2, W2, 3)
    ph = jnp.pad(ph, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
    ph = ph.astype(jnp.float32)
    T = H2 // rt
    idx = (jnp.arange(T)[:, None] * rt
           + jnp.arange(rt + 4)[None, :]).reshape(-1)
    win = jnp.take(ph, idx, axis=2).reshape(B, 4, T, rt + 4, W2 + 4, 3)
    return [win[:, p] for p in range(4)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_pair_pool(x: Array, w1: Array, b1: Array, w2: Array,
                         b2: Array, interpret: bool = False) -> Array:
    """x (B, H, W, 3) [H % 8 == 0, W % 2 == 0], w1 (3,3,3,C1) HWIO with
    BN folded in, b1 (C1,), w2 (3,3,C1,C2), b2 (C2,) ->
    leaky(conv(leaky(conv(x)+b1))+b2) max-pooled 2x2: (B, H/2, W/2, C2)
    f32. Exact (up to f32 summation order) vs the XLA chain."""
    B, H, W, _ = x.shape
    H2, W2 = H // 2, W // 2
    C1, C2 = w1.shape[-1], w2.shape[-1]
    rt = 4
    T = H2 // rt
    wins = _build_windows(x, rt)

    # im2col weights, tap-major to match the concat order
    w1c = jnp.concatenate(
        [w1[dy + 1, dx + 1].astype(jnp.float32) for dy, dx in TAPS], 0)
    w2c = jnp.concatenate(
        [w2[dy + 1, dx + 1].astype(jnp.float32) for dy, dx in TAPS], 0)
    b1r = b1.astype(jnp.float32).reshape(1, 1, C1)
    b2r = b2.astype(jnp.float32).reshape(1, 1, C2)

    operands = wins + [w1c, b1r, w2c, b2r]
    const2 = lambda b, t: (0, 0)
    const3 = lambda b, t: (0, 0, 0)
    in_specs = [pl.BlockSpec((None, None, rt + 4, W2 + 4, 3),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.VMEM)] * 4
    for op in operands[4:]:
        in_specs.append(pl.BlockSpec(
            op.shape, const3 if op.ndim == 3 else const2,
            memory_space=pltpu.VMEM))

    kern = functools.partial(_kernel, W2=W2, H2=H2, C1=C1, C2=C2, rt=rt)
    out = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, None, rt, W2, C2),
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, rt, W2, C2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, rt + 2, W2 + 2, C1), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H2, W2, C2)
