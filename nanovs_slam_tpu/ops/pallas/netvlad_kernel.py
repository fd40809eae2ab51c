"""Fused NetVLAD aggregation as one Pallas TPU kernel.

Fuses the whole NetVLAD chain (netvlad.py:79-106): per-pixel L2 input
normalization -> 1x1-conv soft assignment -> softmax over K clusters ->
residual aggregation -> intra-normalization -> flatten -> global L2,
keeping the (S, C) feature block and (S, K) assignment block resident in
VMEM and running both contractions on the MXU.

The residual reduction uses the matmul identity (see
modules/aggregators.py):
    vlad[k, c] = sum_s a[s, k] * x[s, c]  -  cen[k, c] * sum_s a[s, k]
so the only O(S*K*C) work is one (K, S) x (S, C) matmul — the reference's
(K, C, S) residual tensor (netvlad.py:94-100) is never materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(x_ref, w_ref, cen_ref, out_ref):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)  # (S, C)
    w = w_ref[:].astype(f32)  # (C, K)
    cen = cen_ref[:].astype(f32)  # (K, C)

    # per-pixel L2 normalize across channels
    nrm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    x = x / jnp.maximum(nrm, 1e-12)

    # soft assignment + softmax over K
    logits = jnp.dot(x, w, preferred_element_type=f32)  # (S, K)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)

    # vlad = a^T x - diag(mass) cen
    weighted = jax.lax.dot_general(
        a, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)  # (K, C)
    mass = jnp.sum(a, axis=0)  # (K,)
    vlad = weighted - mass[:, None] * cen

    # intra-normalize per cluster, then global L2 over the flat vector
    intra = jnp.sqrt(jnp.sum(vlad * vlad, axis=-1, keepdims=True))
    vlad = vlad / jnp.maximum(intra, 1e-12)
    total = jnp.sqrt(jnp.sum(vlad * vlad))
    out_ref[0] = vlad / jnp.maximum(total, 1e-12)


@functools.partial(jax.jit, static_argnames=("interpret",))
def netvlad_pallas(x: Array, assign_w: Array, centroids: Array,
                   interpret: bool = False) -> Array:
    """x (B, H, W, C) dense VPR features; assign_w (C, K); centroids (K, C)
    -> (B, K*C) global descriptors (f32)."""
    B, H, W, C = x.shape
    K = assign_w.shape[1]
    S = H * W
    xf = x.reshape(B, S, C)

    out = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, C), jnp.float32),
        interpret=interpret,
    )(xf, assign_w, centroids)
    return out.reshape(B, K * C)
