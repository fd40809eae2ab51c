"""Segmentation decoders (V2 dedicated, V3 fused seg+feat[+depth]).

Behavioral contract (reference: src/kp2dtiny/modules/decoders/segmentation.py):

- SegmentationHead (:8-166), V2 no-attention: U-ish decoder
  conv(c_in->ch), conv(ch->ch), pool, conv(ch->ch), conv(ch->ch),
  conv(ch->d1), [drop], up2x (d1->d1/4), cat(x), conv(ch+d1/4->ch), [drop],
  conv(ch->d1), up2x, cat(skip), conv(c_exp->ch), final Conv(ch->c_out).

- SegmentationHeadATT (:350-475), V2 attention: conv(c_in->ch), ATT, pool,
  ATT, conv(ch->d1), [drop], up2x, cat(x), conv(ch+d1/4->ch), conv(ch->d1),
  [drop], up2x, cat(skip), conv(c_exp->ch), final Conv(ch->c_out).

- SegmentationFeatHeadLight (:169-347), V3 fused: same skeleton as the V2
  no-attention head but the pre-final conv maps c_exp->c_hidden_b where
  c_hidden_b = ch (+ ch/2 if depth), and the final tensor is channel-split
  (dim_split = ch // 2, :190):
    feat  = Conv(dim_split->n_feat)( y[..., :dim_split] )
    depth = Conv(dim_split->1, no bias)( y[..., dim_split:2*dim_split] )  (opt)
    seg   = Conv(dim_split->c_out)( y[..., -dim_split:] )

- SegmentationFeatHeadLightATT (:478-619), V3 attention: ATT skeleton + the
  same channel split.

Constructor channel args follow the reference call sites
(kp2dtiny.py:391-437, :756-790): c_in=c4, c_hidden=c5, c_exp=c4+c3,
d1=channel_dims[5].
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import SegFormerAttentionModule
from .backbone import max_pool_2x2
from .blocks import ConvBNAct, Dropout2d, Upsampler

Dtype = Any


class SegmentationHead(nn.Module):
    """V2 dedicated segmentation head, no attention."""

    c_hidden: int
    c_out: int
    d1: int
    with_drop: bool = True
    bn_momentum: float = 0.1
    upscale_method: str = "pixelshuffle"
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        drop = Dropout2d(0.2)
        up = lambda i: Upsampler(self.d1, self.upscale_method,
                                 self.bn_momentum, self.leaky_relu,
                                 self.dtype, name=f"upsample{i}")

        seg = ConvBNAct(self.c_hidden, name="convs_0", **kw)(x, train)
        seg = ConvBNAct(self.c_hidden, name="convs_1", **kw)(seg, train)
        seg = max_pool_2x2(seg)
        seg = ConvBNAct(self.c_hidden, name="convs_2", **kw)(seg, train)
        seg = ConvBNAct(self.c_hidden, name="convs_3", **kw)(seg, train)
        seg = ConvBNAct(self.d1, name="convs_4", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(1)(seg, train)
        seg = jnp.concatenate([seg, x], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_5", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = ConvBNAct(self.d1, name="convs_6", **kw)(seg, train)
        seg = up(2)(seg, train)
        seg = jnp.concatenate([seg, skip], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_7", **kw)(seg, train)
        return nn.Conv(self.c_out, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="convs_8")(seg)


class SegmentationHeadATT(nn.Module):
    """V2 dedicated segmentation head with SegFormer attention blocks."""

    c_hidden: int
    c_out: int
    d1: int
    with_drop: bool = True
    bn_momentum: float = 0.1
    upscale_method: str = "pixelshuffle"
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        drop = Dropout2d(0.2)
        up = lambda i: Upsampler(self.d1, self.upscale_method,
                                 self.bn_momentum, self.leaky_relu,
                                 self.dtype, name=f"upsample{i}")

        seg = ConvBNAct(self.c_hidden, name="convs_0", **kw)(x, train)
        seg = SegFormerAttentionModule(self.c_hidden, dtype=self.dtype,
                                       name="convs_1")(seg, train)
        seg = max_pool_2x2(seg)
        seg = SegFormerAttentionModule(self.c_hidden, dtype=self.dtype,
                                       name="convs_2")(seg, train)
        seg = ConvBNAct(self.d1, name="convs_3", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(1)(seg, train)
        seg = jnp.concatenate([seg, x], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_4", **kw)(seg, train)
        seg = ConvBNAct(self.d1, name="convs_5", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(2)(seg, train)
        seg = jnp.concatenate([seg, skip], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_6", **kw)(seg, train)
        return nn.Conv(self.c_out, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="convs_7")(seg)


class SegmentationFeatHeadLight(nn.Module):
    """V3 fused seg + descriptor (+ depth) head, no attention."""

    c_hidden: int
    c_out: int
    n_feat: int
    d1: int
    with_drop: bool = True
    bn_momentum: float = 0.1
    upscale_method: str = "pixelshuffle"
    leaky_relu: bool = True
    depth: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert self.c_hidden % 2 == 0, "c_hidden must be divisible by 2"
        dim_split = self.c_hidden // 2
        c_hidden_b = self.c_hidden + (dim_split if self.depth else 0)
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        drop = Dropout2d(0.2)
        up = lambda i: Upsampler(self.d1, self.upscale_method,
                                 self.bn_momentum, self.leaky_relu,
                                 self.dtype, name=f"upsample{i}")

        seg = ConvBNAct(self.c_hidden, name="convs_0", **kw)(x, train)
        seg = ConvBNAct(self.c_hidden, name="convs_1", **kw)(seg, train)
        seg = max_pool_2x2(seg)
        seg = ConvBNAct(self.c_hidden, name="convs_2", **kw)(seg, train)
        seg = ConvBNAct(self.c_hidden, name="convs_3", **kw)(seg, train)
        seg = ConvBNAct(self.d1, name="convs_4", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(1)(seg, train)
        seg = jnp.concatenate([seg, x], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_5", **kw)(seg, train)
        seg = ConvBNAct(self.d1, name="convs_6", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(2)(seg, train)
        seg = jnp.concatenate([seg, skip], axis=-1)
        y = ConvBNAct(c_hidden_b, name="convs_7", **kw)(seg, train)

        feat = nn.Conv(self.n_feat, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="featB")(y[..., :dim_split])
        seg_out = nn.Conv(self.c_out, (3, 3), padding="SAME", use_bias=True,
                          dtype=self.dtype, name="convs_8")(y[..., -dim_split:])
        if self.depth:
            depth = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name="featD")(
                y[..., dim_split:2 * dim_split])
            return seg_out, feat, depth
        return seg_out, feat


class SegmentationFeatHeadLightATT(nn.Module):
    """V3 fused seg + descriptor (+ depth) head with attention blocks."""

    c_hidden: int
    c_out: int
    n_feat: int
    d1: int
    with_drop: bool = True
    bn_momentum: float = 0.1
    upscale_method: str = "pixelshuffle"
    leaky_relu: bool = True
    depth: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert self.c_hidden % 2 == 0, "c_hidden must be divisible by 2"
        dim_split = self.c_hidden // 2
        c_hidden_b = self.c_hidden + (dim_split if self.depth else 0)
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        drop = Dropout2d(0.2)
        up = lambda i: Upsampler(self.d1, self.upscale_method,
                                 self.bn_momentum, self.leaky_relu,
                                 self.dtype, name=f"upsample{i}")

        seg = ConvBNAct(self.c_hidden, name="convs_0", **kw)(x, train)
        seg = SegFormerAttentionModule(self.c_hidden, dtype=self.dtype,
                                       name="convs_1")(seg, train)
        seg = max_pool_2x2(seg)
        seg = SegFormerAttentionModule(self.c_hidden, dtype=self.dtype,
                                       name="convs_2")(seg, train)
        seg = ConvBNAct(self.d1, name="convs_3", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(1)(seg, train)
        seg = jnp.concatenate([seg, x], axis=-1)
        seg = ConvBNAct(self.c_hidden, name="convs_4", **kw)(seg, train)
        seg = ConvBNAct(self.d1, name="convs_5", **kw)(seg, train)
        if self.with_drop:
            seg = drop(seg, train)
        seg = up(2)(seg, train)
        seg = jnp.concatenate([seg, skip], axis=-1)
        y = ConvBNAct(c_hidden_b, name="convs_6", **kw)(seg, train)

        feat = nn.Conv(self.n_feat, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="featB")(y[..., :dim_split])
        seg_out = nn.Conv(self.c_out, (3, 3), padding="SAME", use_bias=True,
                          dtype=self.dtype, name="convs_7")(y[..., -dim_split:])
        if self.depth:
            depth = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name="featD")(
                y[..., dim_split:2 * dim_split])
            return seg_out, feat, depth
        return seg_out, feat
