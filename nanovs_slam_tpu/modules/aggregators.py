"""Global-descriptor aggregators for visual place recognition.

Behavioral contract (reference: src/kp2dtiny/modules/aggregators/):

- NetVLAD (netvlad.py:19-106): L2-normalize input per pixel across channels,
  1x1 conv soft-assignment -> softmax over K clusters, residuals to
  centroids weighted by assignment, sum over space, intra-normalize per
  cluster, flatten, L2. init_params (vladv1, :52-63) sets
  alpha = -log(0.01)/mean(top1-top2 cluster dots), conv weight =
  alpha * normalized centroids, no bias.

  TPU-native formulation: the residual reduction
     vlad[n,k,c] = sum_s a[n,k,s] * (x[n,s,c] - cen[k,c])
  is computed as one batched matmul  a @ x  minus the rank-1 correction
  cen[k,c] * sum_s a[n,k,s]  — this puts all the FLOPs on the MXU instead
  of materializing the (N,K,C,S) residual tensor the reference builds
  (netvlad.py:94-100). A fused Pallas kernel lives in
  nanovs_slam_tpu.ops.pallas.netvlad_kernel.

- GeM (gem.py:7-43): PixelUnshuffle(4) -> clamp(eps)^p -> global avg pool
  -> ^(1/p), learnable scalar p (init 3). Output dim = C * 16.

- ConvAP (convap.py:8-34): 1x1 channel-pool conv -> adaptive avg-pool to
  (s1, s2) -> flatten -> L2 normalize. Output dim = out_channels * s1 * s2.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import l2_normalize, pixel_unshuffle

Dtype = Any


class NetVLAD(nn.Module):
    num_clusters: int = 64
    dim: int = 128
    normalize_input: bool = True
    vladv2: bool = False  # vladv2 adds a bias to the assignment conv
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) dense features -> (B, K*C) global descriptor."""
        B, H, W, C = x.shape
        K = self.num_clusters
        assert C == self.dim

        if self.normalize_input:
            x = l2_normalize(x, axis=-1)

        # soft assignment: 1x1 conv == matmul over channels
        assign_w = self.param("assign_w", nn.initializers.lecun_normal(),
                              (C, K), jnp.float32)
        centroids = self.param("centroids", nn.initializers.uniform(scale=1.0),
                               (K, C), jnp.float32)

        xf = x.reshape(B, H * W, C)
        logits = jnp.einsum("bsc,ck->bsk", xf, assign_w,
                            preferred_element_type=jnp.float32)
        if self.vladv2:
            assign_b = self.param("assign_b", nn.initializers.zeros, (K,),
                                  jnp.float32)
            logits = logits + assign_b
        a = nn.softmax(logits, axis=-1)  # (B, S, K)

        # vlad[b,k,c] = sum_s a[b,s,k] * x[b,s,c] - cen[k,c] * sum_s a[b,s,k]
        weighted = jnp.einsum("bsk,bsc->bkc", a, xf.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        mass = jnp.sum(a, axis=1)  # (B, K)
        vlad = weighted - mass[..., None] * centroids[None]

        vlad = l2_normalize(vlad, axis=-1)  # intra-normalization per cluster
        vlad = vlad.reshape(B, K * C)
        return l2_normalize(vlad, axis=-1)

    @staticmethod
    def init_params_from_clusters(clsts: np.ndarray, traindescs: np.ndarray):
        """Compute (assign_w, centroids) from k-means clusters, vladv1 style
        (netvlad.py:52-63). clsts: (K, C), traindescs: (M, C). Returns
        assign_w (C, K) and centroids (K, C) as numpy arrays."""
        clsts_assign = clsts / np.linalg.norm(clsts, axis=1, keepdims=True)
        dots = clsts_assign @ traindescs.T  # (K, M)
        dots = -np.sort(-dots, axis=0)  # descending per column
        alpha = (-np.log(0.01) / np.mean(dots[0, :] - dots[1, :])).item()
        assign_w = (alpha * clsts_assign).T.astype(np.float32)  # (C, K)
        return assign_w, clsts.astype(np.float32)


class GeM(nn.Module):
    eps: float = 1e-6
    unshuffle: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.param("p", lambda k, s: jnp.full(s, 3.0), (1,))
        if self.unshuffle > 1:
            x = pixel_unshuffle(x, self.unshuffle)
        x = jnp.clip(x, min=self.eps) ** p
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = x ** (1.0 / p)
        return x.reshape(x.shape[0], -1)


def adaptive_avg_pool_2d(x: jnp.ndarray, s1: int, s2: int) -> jnp.ndarray:
    """NHWC adaptive average pooling matching torch.nn.AdaptiveAvgPool2d:
    output bin (i, j) averages input rows [floor(i*H/s1), ceil((i+1)*H/s1))."""
    B, H, W, C = x.shape
    rows = []
    for i in range(s1):
        r0 = int(np.floor(i * H / s1))
        r1 = int(np.ceil((i + 1) * H / s1))
        cols = []
        for j in range(s2):
            c0 = int(np.floor(j * W / s2))
            c1 = int(np.ceil((j + 1) * W / s2))
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    out = jnp.stack(rows, axis=1)  # (B, s1, s2, C)
    return out


class ConvAP(nn.Module):
    out_channels: int = 512
    s1: int = 2
    s2: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="channel_pool")(x)
        x = adaptive_avg_pool_2d(x, self.s1, self.s2)  # (B, s1, s2, C)
        # torch flattens NCHW (C, s1, s2) -> keep that order for ckpt parity
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        return l2_normalize(x, axis=-1)
