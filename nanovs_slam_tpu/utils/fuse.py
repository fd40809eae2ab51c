"""Conv+BatchNorm folding for inference.

TPU-native analog of the reference's fuse_modules (kp2dtiny.py:19-30,
torch.quantization.fuse_modules on every conv+bn+relu block): at inference
the BN affine transform is folded into the preceding conv kernel
(and a new bias), removing the BN elementwise pass entirely:

    w' = w * gamma / sqrt(var + eps)
    b' = beta - gamma * mean / sqrt(var + eps)

Applies to every {conv: {kernel}, bn: {scale, bias}} sibling pair in the
param tree (ConvBNAct blocks). XLA would fuse BN into the conv epilogue
anyway, but folding removes the ops from the graph (smaller HLO, faster
compile) and is required for int8 deployment.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def fold_batchnorm(params: Dict, batch_stats: Dict, eps: float = 1e-5
                   ) -> Tuple[Dict, Dict]:
    """Returns (folded_params, empty_batch_stats-like) where every conv
    directly followed by a bn has the bn folded in. The folded tree keeps
    the same structure (bn scale=1, bias=0, stats mean=0 var=1) so the
    model applies unchanged — XLA eliminates the no-op BN."""

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else {}
        if "conv" in p and "bn" in p and isinstance(p["conv"], dict) \
                and "kernel" in p["conv"] and "bn" in s:
            kernel = np.asarray(p["conv"]["kernel"], np.float32)
            gamma = np.asarray(p["bn"]["scale"], np.float32)
            beta = np.asarray(p["bn"]["bias"], np.float32)
            mean = np.asarray(s["bn"]["mean"], np.float32)
            var = np.asarray(s["bn"]["var"], np.float32)
            inv = gamma / np.sqrt(var + eps)
            new_kernel = kernel * inv  # broadcast over HWIO out dim
            new_bias = beta - mean * inv
            conv = dict(p["conv"])
            conv["kernel"] = new_kernel
            p["conv"] = conv
            # BN becomes a pure bias add (scale 1, stats identity), which
            # XLA folds into the conv epilogue; the conv itself has no
            # bias param (use_bias=False) so the bias rides in the BN.
            p["bn"] = {"scale": np.ones_like(gamma), "bias": new_bias}
            s["bn"] = {"mean": np.zeros_like(mean),
                       "var": np.ones_like(var) * (1.0 - eps)}
        for k in list(p.keys()):
            if isinstance(p[k], dict) and k not in ("conv", "bn"):
                p[k], sk = walk(p[k], s.get(k, {}))
                if isinstance(s, dict) and k in s:
                    s[k] = sk
        return p, s

    return walk(params, batch_stats)
