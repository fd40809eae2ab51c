"""Conv self-attention (SegFormer-style) segmentation block.

Behavioral contract (reference: src/kp2dtiny/modules/segformer.py:86-220):
- EfficientSelfAttention (:86-138): q from 1x1 conv (no bias), k/v from one
  strided conv (kernel=stride=reduction_ratio=2, no bias, 2*dim out),
  4 heads, scaled dot-product softmax attention over the flattened feature
  map, 1x1 output conv (no bias).
- MixFeedForward (:182-206): 1x1 conv -> depthwise 3x3 + pointwise 1x1
  (DsConv2d :43-60, with bias) -> GELU -> 1x1 conv, expansion factor 2.
- Channel LayerNorm (:63-73): normalizes over the channel dim with the
  reference's biased-variance + eps-outside-sqrt formula
  (x - mean) / (sqrt(var) + eps) * g + b.
- SegFormerAttentionModule (:209-220): PreNorm(att) then PreNorm(mff).
  NOTE the reference applies fn(norm(x)) with NO residual connection —
  we reproduce that exactly (it is part of trained-weight compatibility).

TPU-first notes: attention is computed in one batched einsum per step
(B*heads folded into the batch dim of a 3D matmul -> MXU); sequence length
is the flattened map (<= ~1.2k tokens at eval sizes) so no blocking needed.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels with the reference's exact formula
    (segformer.py:63-73): (x - mean) / (sqrt(biased_var) + eps) * g + b."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)  # biased, like torch.var(unbiased=False)
        y = (x - mean) / (jnp.sqrt(var) + self.eps)
        return y * g + b


class EfficientSelfAttention(nn.Module):
    """Spatially-reduced self-attention over an NHWC feature map."""

    dim: int
    heads: int = 4
    reduction_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = self.heads
        dh = C // h
        scale = dh ** -0.5
        r = self.reduction_ratio

        q = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Conv(2 * C, (r, r), strides=(r, r), padding="VALID",
                     use_bias=False, dtype=self.dtype, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        Hr, Wr = k.shape[1], k.shape[2]
        # (B, H, W, h*dh) -> (B, h, H*W, dh): head-major channel split matches
        # the reference rearrange 'b (h c) x y -> (b h) (x y) c'.
        def to_heads(t, n):
            return t.reshape(B, n, h, dh).transpose(0, 2, 1, 3)

        qh = to_heads(q.reshape(B, H * W, C), H * W)
        kh = to_heads(k.reshape(B, Hr * Wr, C), Hr * Wr)
        vh = to_heads(v.reshape(B, Hr * Wr, C), Hr * Wr)

        sim = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                         preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(sim, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                         preferred_element_type=jnp.float32).astype(x.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                       name="to_out")(out)


class MixFeedForward(nn.Module):
    """1x1 expand -> depthwise 3x3 -> pointwise 1x1 -> GELU -> 1x1 project."""

    dim: int
    expansion_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim * self.expansion_factor
        x = nn.Conv(hidden, (1, 1), use_bias=True, dtype=self.dtype,
                    name="expand")(x)
        # DsConv2d: depthwise 3x3 then pointwise 1x1, both with bias.
        x = nn.Conv(hidden, (3, 3), feature_group_count=hidden, use_bias=True,
                    dtype=self.dtype, name="dw")(x)
        x = nn.Conv(hidden, (1, 1), use_bias=True, dtype=self.dtype,
                    name="pw")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                       name="project")(x)


class SegFormerAttentionModule(nn.Module):
    """PreNorm(attention) then PreNorm(mix-FF); no residuals (see module doc)."""

    dim: int
    heads: int = 4
    reduction_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # no dropout/BN inside this block
        y = ChannelLayerNorm(name="norm_att")(x)
        y = EfficientSelfAttention(self.dim, self.heads, self.reduction_ratio,
                                   self.dtype, name="att")(y)
        z = ChannelLayerNorm(name="norm_mff")(y)
        return MixFeedForward(self.dim, 2, self.dtype, name="mff")(z)
