"""Shared convolutional backbone.

Behavioral contract (reference: src/kp2dtiny/modules/encoders.py:5-129):
8 conv blocks conv1a..conv4b with a MaxPool(2,2) schedule keyed on
`downsample`:
  pool after block pair 1 if downsample >= 2   (encoders.py:110-111)
  pool after block pair 2 if downsample >= 3   (encoders.py:116-117)
  pool after the skip tap  if downsample >= 1  (encoders.py:122-123)
Skip connection taps conv3b's output (encoders.py:119) at resolution
H/(cell/2); main output is at H/cell with cell = 2**downsample.
Dropout2d(0.2) after each pair when with_drop.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBNAct, Dropout2d

Dtype = Any


def max_pool_2x2(x):
    from ..quant import QTensor

    if isinstance(x, QTensor):
        # max-pool commutes with (positive-scale) quantization: pool the
        # int8 values directly so the chained tensor stays int8
        return QTensor(nn.max_pool(x.values, window_shape=(2, 2),
                                   strides=(2, 2)), x.scale)
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class BackBone(nn.Module):
    """Returns (x, skip): x at 1/cell resolution (c4 ch), skip at 1/(cell/2)
    resolution (c4 ch)."""

    c1: int
    c2: int
    c3: int
    c4: int
    downsample: int = 2
    with_drop: bool = True
    bn_momentum: float = 0.1
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        drop = Dropout2d(0.2)

        x = ConvBNAct(self.c1, name="conv1a", **kw)(x, train)
        x = ConvBNAct(self.c2, name="conv1b", **kw)(x, train)
        if self.with_drop:
            x = drop(x, train)
        if self.downsample >= 2:
            x = max_pool_2x2(x)

        x = ConvBNAct(self.c2, name="conv2a", **kw)(x, train)
        x = ConvBNAct(self.c3, name="conv2b", **kw)(x, train)
        if self.with_drop:
            x = drop(x, train)
        if self.downsample >= 3:
            x = max_pool_2x2(x)

        x = ConvBNAct(self.c3, name="conv3a", **kw)(x, train)
        skip = ConvBNAct(self.c4, name="conv3b", **kw)(x, train)
        if self.with_drop:
            skip = drop(skip, train)
        if self.downsample >= 1:
            x = max_pool_2x2(skip)
        else:
            x = skip

        x = ConvBNAct(self.c4, name="conv4a", **kw)(x, train)
        x = ConvBNAct(self.c4, name="conv4b", **kw)(x, train)
        if self.with_drop:
            x = drop(x, train)
        return x, skip
