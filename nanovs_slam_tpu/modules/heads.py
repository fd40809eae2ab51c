"""Keypoint task heads.

Behavioral contract (reference: src/kp2dtiny/modules/decoders/heads.py):
- SimpleTaskHead (:7-35): ConvBNAct(c_in->c_hidden) [+ drop] + plain
  Conv2d(c_hidden->c_out, 3x3, bias). Used for the score (1ch, V2), loc
  (2ch, V2) and fused score+loc (3ch, V3) heads.
- UpscaleHead (:38-104): convA ConvBNAct(c0->c1) [+drop] -> convB plain
  Conv(c1->c2) -> 2x upsample (pixelshuffle or convtranspose) -> concat skip
  -> convAa ConvBNAct(c3->c4) -> convBb plain Conv(c4->c5). Produces the
  dense descriptor map at skip resolution (V2 descriptor head).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBNAct, Dropout2d, Upsampler

Dtype = Any


class SimpleTaskHead(nn.Module):
    c_hidden: int
    c_out: int
    bn_momentum: float = 0.1
    with_drop: bool = False
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(self.c_hidden, bn_momentum=self.bn_momentum,
                      leaky_relu=self.leaky_relu, dtype=self.dtype,
                      name="convDa")(x, train)
        if self.with_drop:
            x = Dropout2d(0.2)(x, train)
        return nn.Conv(self.c_out, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="convDb")(x)


class UpscaleHead(nn.Module):
    """Dense descriptor head: upsample 2x, fuse skip, project to nfeatures."""

    c1: int  # convA out
    c2: int  # convB out (pre-pixelshuffle, = 4 * post channels)
    c4: int  # convAa out
    c5: int  # final descriptor channels (nfeatures)
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
        x = ConvBNAct(self.c1, name="convA", **kw)(x, train)
        if self.with_drop:
            x = Dropout2d(0.2)(x, train)
        x = nn.Conv(self.c2, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="convB")(x)
        x = Upsampler(self.c2, self.upscale_method, self.bn_momentum,
                      self.leaky_relu, self.dtype, name="upsample1")(x, train)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.c4, name="convAa", **kw)(x, train)
        return nn.Conv(self.c5, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype, name="convBb")(x)
