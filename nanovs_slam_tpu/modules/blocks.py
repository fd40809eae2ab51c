"""Basic NN blocks, NHWC / TPU-native.

Behavioral contract from the reference (src/kp2dtiny/modules/base.py):
- ConvBNAct == AnnotatedConvBnReLUModel (base.py:14-46): 3x3 conv (no bias)
  + BatchNorm(momentum 0.1 torch-convention) + (Leaky)ReLU. Quant stubs are a
  torch-PTQ artifact and have no TPU equivalent (AQT-style quantization lives
  in nanovs_slam_tpu.quant instead).
- TransposedConvUpsample == TransposedConvUpsampleModel (base.py:80-117):
  ConvTranspose(c -> c//4, k3 s2 p1 output_padding 1) + BN + act; exact 2x
  spatial upsample. Used by the MCU deployment path.
- pixel_shuffle matches torch.nn.PixelShuffle channel ordering so that
  imported torch checkpoints produce identical outputs.
- l2_normalize == L2Norm (base.py:5-11), eps semantics of F.normalize.

All modules take/return NHWC tensors (TPU-native layout; the reference is
NCHW) and a `train` flag that switches BatchNorm stats and dropout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalization matching torch.nn.functional.normalize semantics:
    x / max(||x||_2, eps). The norm is computed as sqrt(sum(x^2) + eps^2) so
    its gradient stays finite at x == 0 (torch defines a zero subgradient
    there; jnp.linalg.norm's is NaN)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)
                    + eps * eps)
    return x / jnp.maximum(norm, eps)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch.nn.PixelShuffle channel ordering.

    in:  (B, H, W, C*r*r) where channel index = c*r*r + i*r + j
    out: (B, H*r, W*r, C) with out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r+i*r+j]
    """
    B, H, W, C = x.shape
    assert C % (r * r) == 0, f"channels {C} not divisible by {r*r}"
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, c
    return x.reshape(B, H * r, W * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC inverse of pixel_shuffle (== torch.nn.PixelUnshuffle).

    in:  (B, H*r, W*r, C)  ->  out: (B, H, W, C*r*r),
    out[b, h, w, c*r*r + i*r + j] = in[b, h*r+i, w*r+j, c]
    """
    B, Hr, Wr, C = x.shape
    assert Hr % r == 0 and Wr % r == 0
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, c, i, j
    return x.reshape(B, H, W, C * r * r)


def act_fn(x: jnp.ndarray, leaky: bool) -> jnp.ndarray:
    """(Leaky)ReLU with torch defaults (negative_slope=0.01)."""
    return nn.leaky_relu(x, negative_slope=0.01) if leaky else nn.relu(x)


class ConvBNAct(nn.Module):
    """Conv(3x3, no bias) + BatchNorm + (Leaky)ReLU.

    Reference: AnnotatedConvBnReLUModel (src/kp2dtiny/modules/base.py:14-46).
    The reference's quant/dequant stubs bound exactly these blocks
    (base.py:36-46); their TPU analog is the int8 execution context
    (quant.int8_execution): when active at trace time with a calibrated
    input scale for this module's path, the conv runs int8 x int8 -> int32
    on the MXU. Calibration sows the conv-input absmax into the
    `intermediates` collection (zero cost unless requested).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    bn_momentum: float = 0.1  # torch convention; flax momentum = 1 - this
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        from .. import quant

        path = "/".join(self.path)
        pre_q = isinstance(x, quant.QTensor)
        padding = ("SAME" if self.kernel_size == 3 and self.stride == 1 else
                   [(self.kernel_size // 2, self.kernel_size // 2)] * 2)
        if not pre_q and self.is_mutable_collection("intermediates"):
            self.sow("intermediates", "in_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.float32(0.0))
        conv = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )
        x_f32 = x.values.astype(jnp.float32) * x.scale if pre_q else x
        y = conv(x_f32)
        scale_in = quant.active_int8_scale(path) if not train else None
        if scale_in is not None or pre_q:
            kernel = self.get_variable("params", "conv")["kernel"]
            # replaces the f32 conv result; XLA dead-code-eliminates the
            # unused f32 conv above (its params must still be created)
            y = quant.int8_conv(x if pre_q else x_f32, kernel, scale_in,
                                (self.stride, self.stride), padding)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(y)
        y = act_fn(y, self.leaky_relu)
        out_scale = quant.active_int8_out_scale(path) if not train else None
        if out_scale is not None:
            # chained emission: the consumer's calibrated input scale is
            # this tensor's scale (pool/eval-dropout between are
            # value-preserving), so the HBM-resident inter-block tensor
            # stays int8
            return quant.quantize_activation(y, out_scale)
        return y


class TransposedConvKernel(nn.Module):
    """Bare ConvTranspose(c -> c//4, k3 s2 p1 op1): exact 2x upsample.

    Reference: the transposed_conv inside TransposedConvUpsampleModel
    (base.py:80-117). Kernel layout (H, W, O, I) with
    transpose_kernel=True — the gradient-of-conv convention, which is
    exactly torch ConvTranspose2d's semantics (weight (I, O, kH, kW) maps
    via transpose(2, 3, 1, 0); verified numerically vs torch). The BN+act
    live in the PARENT scope so param paths mirror the reference's
    upsample.{transposed_conv, bn} siblings for checkpoint import.
    """

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (3, 3, self.out_features, x.shape[-1]),
            jnp.float32,
        )
        # torch output size: (H-1)*s - 2p + k + op = 2H with k=3,s=2,p=1,op=1.
        return jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(2, 2),
            padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )


class TransposedConvUpsample(nn.Module):
    """ConvTranspose(c -> c//4) + BN + act (TransposedConvUpsampleModel,
    base.py:80-117)."""

    in_features: int
    bn_momentum: float = 0.1
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = TransposedConvKernel(self.in_features // 4, self.dtype,
                                 name="transposed_conv")(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(y)
        return act_fn(y, self.leaky_relu)


class Dropout2d(nn.Module):
    """Channel dropout (torch Dropout2d): zeroes whole channels.

    In NHWC this broadcasts the mask over the spatial dims (1, 2).
    """

    rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .. import quant

        if isinstance(x, quant.QTensor):  # chained int8, inference-only
            return x
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(
            x, deterministic=not train)


class Upsampler(nn.Module):
    """Upscale-by-2 block selected by config: pixelshuffle (c -> c//4 via
    rearrange) or convtranspose (MCU path). Both take C channels in and
    produce C//4 channels at 2x resolution.

    Reference: upscale_method switch (heads.py:53-58, segmentation.py:113-120).
    """

    in_features: int
    method: str = "pixelshuffle"
    bn_momentum: float = 0.1
    leaky_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.method == "pixelshuffle":
            return pixel_shuffle(x, 2)
        if self.method == "convtranspose":
            # flat sub-module names so param paths mirror the reference's
            # upsample.{transposed_conv, bn} for checkpoint import
            y = TransposedConvKernel(self.in_features // 4, self.dtype,
                                     name="transposed_conv")(x)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=1.0 - self.bn_momentum, epsilon=1e-5,
                             dtype=self.dtype, name="bn")(y)
            return act_fn(y, self.leaky_relu)
        raise NotImplementedError(f"upscale method {self.method}")
