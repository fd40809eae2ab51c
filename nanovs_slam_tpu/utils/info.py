"""Model info (reference gather_info, kp2dtiny.py:463-485)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from ..configs import KP2DTinyConfig


def n_params(tree) -> int:
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(tree)))


def gather_info(cfg: KP2DTinyConfig, params) -> Dict:
    return {
        "init_args": {
            "nfeatures": cfg.nfeatures,
            "channel_dims": list(cfg.channel_dims),
            "downsample": cfg.downsample,
            "use_attention": cfg.use_attention,
            "leaky_relu": cfg.leaky_relu,
            "num_clusters": cfg.num_clusters,
            "encoder_dim": cfg.enc_dim,
            "nClasses": cfg.n_classes,
            "global_descriptor_method": cfg.global_descriptor_method,
            "upscale_method": cfg.upscale_method,
            "variant": cfg.variant,
        },
        "total_params": n_params(params),
        "trainable_params": n_params(params),
        "netvlad_dim": cfg.global_desc_dim,
        "upscale_method": cfg.upscale_method,
        "leaky_relu": cfg.leaky_relu,
        "use_attention": cfg.use_attention,
    }
