"""VPR head: 3 conv blocks + global-descriptor aggregator.

Behavioral contract (reference: src/kp2dtiny/modules/decoders/vpr.py:8-89):
convlad1 ConvBNAct(c_in->enc) [+drop] -> convlad2 ConvBNAct(enc->enc) ->
convlad3 ConvBNAct(enc->enc) -> aggregator selected by `method`
(netvlad | gem | convap). `only_encoder=True` returns the L2-normalized
dense feature map instead (used for k-means cluster init, vpr.py:85-86).
`remove_netvlad` (export mode) skips aggregation and returns dense maps.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .aggregators import ConvAP, GeM, NetVLAD
from .blocks import ConvBNAct, Dropout2d, l2_normalize

Dtype = Any


class VPRHead(nn.Module):
    encoder_dim: int
    num_clusters: int = 64
    with_drop: bool = True
    bn_momentum: float = 0.1
    remove_netvlad: bool = False
    leaky_relu: bool = True
    method: str = "netvlad"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, only_encoder: bool = False,
                 train: bool = False) -> jnp.ndarray:
        kw = dict(bn_momentum=self.bn_momentum, leaky_relu=self.leaky_relu,
                  dtype=self.dtype)
        v = ConvBNAct(self.encoder_dim, name="convlad1", **kw)(x, train)
        if self.with_drop:
            v = Dropout2d(0.2)(v, train)
        v = ConvBNAct(self.encoder_dim, name="convlad2", **kw)(v, train)
        v = ConvBNAct(self.encoder_dim, name="convlad3", **kw)(v, train)

        if self.method == "netvlad":
            if self.remove_netvlad:
                return v
            if only_encoder:
                return l2_normalize(v, axis=-1)
            return NetVLAD(self.num_clusters, self.encoder_dim,
                           dtype=self.dtype, name="netvlad")(v)
        if only_encoder:
            return l2_normalize(v, axis=-1)
        if self.method == "gem":
            return GeM(unshuffle=4, dtype=self.dtype, name="netvlad")(v)
        if self.method == "convap":
            return ConvAP(self.encoder_dim, 4, 4, dtype=self.dtype,
                          name="netvlad")(v)
        raise ValueError(f"unknown global descriptor method {self.method}")
