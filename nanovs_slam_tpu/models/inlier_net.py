"""InlierNet (IO-Net): NG-RANSAC-style 1D CNN over matched point pairs.

Behavioral contract (reference: src/kp2dtiny/models/inlier_net.py:11-50):
input (B, 5, N, 1) [we use (B, N, 5)]: per-match
(x0, y0, x1, y1, desc_dist). p_in: 1x1 conv(5->128, no bias) + BN(momentum
0.9 torch) then relu; 4 residual blocks of [conv1x1 -> instance_norm ->
BN -> relu] x2 with skip; p_out: 1x1 conv(128->1). All convs are pointwise,
so on TPU this is a per-match MLP: (B*N, C) matmuls on the MXU.
Instance norm normalizes over the match axis per (batch, channel), no
affine, eps 1e-5 (torch F.instance_norm default).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x (B, N, C): normalize over N per (batch, channel), no affine."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class InlierNet(nn.Module):
    blocks: int = 4
    width: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, point_pair: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        """point_pair (B, N, 5) -> inlier logits (B, N)."""
        x = nn.Dense(self.width, use_bias=False, dtype=self.dtype,
                     name="p_in_conv")(point_pair)
        # reference p_in BN has momentum=0.9 (torch) -> flax momentum 0.1
        x = nn.BatchNorm(use_running_average=not train, momentum=0.1,
                         epsilon=1e-5, dtype=self.dtype, name="p_in_bn")(x)
        x = nn.relu(x)
        for i in range(self.blocks):
            res = x
            y = nn.Dense(self.width, use_bias=True, dtype=self.dtype,
                         name=f"b{i}_conv0")(x)
            y = _instance_norm(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"b{i}_bn0")(y)
            y = nn.relu(y)
            y = nn.Dense(self.width, use_bias=True, dtype=self.dtype,
                         name=f"b{i}_conv1")(y)
            y = _instance_norm(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"b{i}_bn1")(y)
            y = nn.relu(y)
            x = y + res
        out = nn.Dense(1, use_bias=True, dtype=self.dtype, name="p_out")(x)
        return out[..., 0]
