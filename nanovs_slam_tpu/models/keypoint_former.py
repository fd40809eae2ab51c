"""KeypointFormer: SegFormer (MiT) pyramid backbone multitask model.

Behavioral contract (reference: src/kp2dtiny/models/kp2d_former.py and
src/kp2dtiny/models/segformer.py):
- MiT (segformer.py:6-91): 4 stages of [overlap-patch embed
  (Unfold k/s/p + 1x1 conv == one strided conv, kernel/stride/pad
  (7,4,3),(3,2,1),(3,2,1),(3,2,1)), num_layers x (PreNorm attention +
  residual, PreNorm mix-FF + residual)] at dims/heads/ff_expansion/
  reduction_ratio per stage. Stage outputs at H/4, H/8, H/16, H/32.
- KeypointFormer (kp2d_former.py:33-228): per-stage 1x1 conv + BN + ReLU
  + nearest 2^i upsample to H/4, channel-concat -> heads: seg (1x1 convs),
  score/loc (stride-2 conv -> cell 8), feat (1x1/3x3 convs at H/4),
  vlad (1x1 stride-2 'conv' with pad 1 -> ReLU -> NetVLAD vladv2).
  Forward applies border mask + coord decode inline; descriptor sampling
  and seg argmax at eval — we reuse ops/postprocess (identical math,
  post_processing is the identity in the reference :203-204).
- Configs (kp2d_former.py:10-30): default (dims 32/64/160/256) and tiny.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..modules.aggregators import NetVLAD
from ..modules.attention import (ChannelLayerNorm, EfficientSelfAttention,
                                 MixFeedForward)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class KeypointFormerConfig:
    dims: Tuple[int, ...] = (32, 64, 160, 256)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    ff_expansion: Tuple[int, ...] = (8, 8, 4, 4)
    reduction_ratio: Tuple[int, ...] = (8, 4, 2, 1)
    num_layers: int = 2
    decoder_dim: int = 256
    feat_dim: int = 256
    n_classes: int = 4
    num_clusters: int = 64
    dtype: str = "float32"

    @property
    def cell(self) -> int:
        return 8

    @property
    def cross_ratio(self) -> float:
        return 2.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


KEYPOINTFORMER_CONFIGS = {
    "default": KeypointFormerConfig(),
    "tiny": KeypointFormerConfig(dims=(16, 32, 64, 64), heads=(1, 2, 4, 4),
                                 ff_expansion=(4, 4, 2, 2),
                                 reduction_ratio=(8, 4, 4, 2),
                                 decoder_dim=64, feat_dim=64),
}

_STAGE_KSP = ((7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1))


class MiT(nn.Module):
    """Mix Transformer pyramid encoder; returns all 4 stage outputs."""

    cfg: KeypointFormerConfig

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        outs = []
        for s, (dim, (k, stride, pad)) in enumerate(
                zip(cfg.dims, _STAGE_KSP)):
            # Unfold + 1x1 embed == one strided overlap-patch conv
            x = nn.Conv(dim, (k, k), strides=(stride, stride),
                        padding=[(pad, pad)] * 2, use_bias=True,
                        dtype=dtype, name=f"stage{s}_embed")(x)
            for l in range(cfg.num_layers):
                y = ChannelLayerNorm(name=f"stage{s}_l{l}_norm_att")(x)
                y = EfficientSelfAttention(
                    dim, cfg.heads[s], cfg.reduction_ratio[s], dtype,
                    name=f"stage{s}_l{l}_att")(y)
                x = x + y  # residual (segformer.py:85)
                y = ChannelLayerNorm(name=f"stage{s}_l{l}_norm_mff")(x)
                y = MixFeedForward(dim, cfg.ff_expansion[s], dtype,
                                   name=f"stage{s}_l{l}_mff")(y)
                x = x + y  # residual (segformer.py:86)
            outs.append(x)
        return tuple(outs)


def _upsample_nearest(x: Array, factor: int) -> Array:
    if factor == 1:
        return x
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


class KeypointFormer(nn.Module):
    cfg: KeypointFormerConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 only_encoder: bool = False) -> Dict[str, Array]:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        d = cfg.decoder_dim
        x = x.astype(dtype)

        stage_outs = MiT(cfg, name="mit")(x)

        fused = []
        for i, so in enumerate(stage_outs):
            y = nn.Conv(d, (1, 1), dtype=dtype, name=f"to_fused{i}_conv")(so)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dtype,
                             name=f"to_fused{i}_bn")(y)
            y = nn.relu(y)
            fused.append(_upsample_nearest(y, 2 ** i))
        fused = jnp.concatenate(fused, axis=-1)  # (B, H/4, W/4, 4d)

        def head(name, convs):
            y = fused
            for j, (feats, kernel, stride, pad, bn) in enumerate(convs):
                y = nn.Conv(feats, (kernel, kernel),
                            strides=(stride, stride),
                            padding=[(pad, pad)] * 2, dtype=dtype,
                            name=f"{name}_conv{j}")(y)
                if bn:
                    y = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5, dtype=dtype,
                                     name=f"{name}_bn{j}")(y)
                    y = nn.relu(y)
            return y

        seg = head("seg", [(d, 1, 1, 0, True), (cfg.n_classes, 1, 1, 0,
                                                False)])
        score = nn.sigmoid(head("score", [(d, 3, 2, 1, True),
                                          (1, 1, 1, 0, False)]))
        shift = nn.tanh(head("loc", [(d, 3, 2, 1, True),
                                     (2, 1, 1, 0, False)]))
        feat = head("feat", [(d, 1, 1, 0, True), (d, 3, 1, 1, True),
                             (cfg.feat_dim, 1, 1, 0, False)])
        vlad_feat = nn.relu(head("vlad", [(d, 1, 2, 1, True),
                                          (cfg.feat_dim, 1, 1, 0, False)]))
        if only_encoder:
            # dense VPR features for cluster init (kp2d_former.py:132-141)
            return vlad_feat
        vlad = NetVLAD(cfg.num_clusters, cfg.feat_dim, vladv2=True,
                       dtype=dtype, name="netvlad")(vlad_feat)

        return {"score": score, "coord": shift, "feat": feat, "seg": seg,
                "vlad": vlad}
