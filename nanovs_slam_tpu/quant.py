"""Int8 quantization (PTQ) for KP2DTiny on TPU.

The reference's quantization stack is torch eager PTQ/QAT with
quant/dequant stubs bounding every conv block (quantize.py:59-70,
base.py:36-46, KeypointNetwithIOLoss.py:377-381). The TPU-native
equivalent implemented here:

- REAL int8 execution: `int8_execution(scales)` is a trace-time context
  that makes every ConvBNAct run its conv as int8 x int8 -> int32 on the
  MXU (activations quantized with calibrated per-conv input scales,
  weights per-output-channel symmetric), rescaling to float before
  BN+act. This is the analog of the reference's quantized graph, where
  quant/dequant stubs bound each conv block (base.py:36-46).
- calibrate_conv_scales: per-conv input absmax over calibration batches
  via flax `intermediates` (the reference calibrates 100 batches,
  quantize.py:7-15).
- quantize_params_int8: per-output-channel symmetric int8 weight
  quantization of every conv/dense kernel, storing int8 values + f32
  scales (deployment artifact; int8 halves/quarters HBM traffic).
- fake_quant_params: quantize->dequantize round trip producing f32
  params that behave like int8 weight rounding — the weight-only
  evaluation path (eval_multitask.py --int8 without calibration).
- fake_quant_ste: QAT building block (straight-through estimator).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# --- real int8 execution -----------------------------------------------
# Trace-time context: when active, ConvBNAct consults it and lowers its
# conv as int8. The scales dict maps module paths ("backbone/conv1a") to
# input activation scales (absmax/127 from calibration). out_scales maps
# PRODUCER paths to the consumer's input scale for activation chaining
# (see chain_out_scales).
_INT8_CTX: Dict[str, Optional[Dict[str, float]]] = {"scales": None,
                                                    "out_scales": None}


class QTensor:
    """int8 activation + its scale, flowing BETWEEN chained conv blocks.

    With plain int8 execution every block stores its f32/bf16 output to
    HBM and the next block re-quantizes it — 3 elementwise passes and a
    full-precision tensor of HBM traffic per edge. Chaining emits int8 at
    the PRODUCER (quantized with the consumer's calibrated input scale,
    which equals this tensor's scale because pools/eval-dropout are
    value-preserving), so the materialized inter-block tensor is int8:
    4x (vs f32) / 2x (vs bf16) less HBM traffic on the stem's full-
    resolution activations, and the consumer skips its quantize pass."""

    __slots__ = ("values", "scale")

    def __init__(self, values: Array, scale: float):
        self.values = values  # int8
        self.scale = scale    # python float (trace-time constant)


@contextmanager
def int8_execution(scales: Dict[str, float],
                   chain: bool = False,
                   topology: Optional[Dict[str, str]] = None):
    """Activate int8 conv execution during model tracing/apply.

    chain=True additionally turns on int8 activation chaining over the
    backbone's single-consumer edges (topology defaults to
    BACKBONE_CHAIN)."""
    prev = (_INT8_CTX["scales"], _INT8_CTX["out_scales"])
    _INT8_CTX["scales"] = dict(scales)
    _INT8_CTX["out_scales"] = (
        chain_out_scales(scales, topology) if chain else None)
    try:
        yield
    finally:
        _INT8_CTX["scales"], _INT8_CTX["out_scales"] = prev


def active_int8_scale(path: str) -> Optional[float]:
    scales = _INT8_CTX["scales"]
    if scales is None:
        return None
    return scales.get(path)


def active_int8_out_scale(path: str) -> Optional[float]:
    out_scales = _INT8_CTX["out_scales"]
    if out_scales is None:
        return None
    return out_scales.get(path)


# Single-consumer edges of the backbone (modules/backbone.py flow):
# producer -> consumer whose calibrated INPUT scale equals the producer's
# output scale (max-pool and eval-mode dropout between them are
# value-preserving). conv3b is excluded: its output feeds both the pooled
# conv4a path AND the heads' skip connections, so it must stay f32.
BACKBONE_CHAIN: Dict[str, str] = {
    "backbone/conv1a": "backbone/conv1b",
    "backbone/conv1b": "backbone/conv2a",
    "backbone/conv2a": "backbone/conv2b",
    "backbone/conv2b": "backbone/conv3a",
    "backbone/conv3a": "backbone/conv3b",
    "backbone/conv4a": "backbone/conv4b",
}


def chain_out_scales(scales: Dict[str, float],
                     topology: Optional[Dict[str, str]] = None
                     ) -> Dict[str, float]:
    """{producer_path: consumer_input_scale} for every chainable edge
    whose consumer has a calibrated scale."""
    topo = BACKBONE_CHAIN if topology is None else topology
    return {prod: scales[cons] for prod, cons in topo.items()
            if cons in scales}


def int8_conv(x, kernel: Array, scale_in: float,
              strides=(1, 1), padding="SAME") -> Array:
    """Quantized conv: round(x/s_x) int8  *  round(w/s_w) int8 -> int32,
    rescaled to f32 by s_x * s_w (per output channel). The int8 x int8 ->
    int32 contraction is the MXU's native high-throughput mode.

    x may be a QTensor (already int8 from a chained producer; its scale
    overrides scale_in and the quantize pass is skipped)."""
    if isinstance(x, QTensor):
        xq, scale_in = x.values, x.scale
    else:
        x = x.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x / scale_in), -127, 127).astype(jnp.int8)
    w = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (scale_in * s_w.reshape(1, 1, 1, -1))


def quantize_activation(y: Array, scale: float) -> "QTensor":
    """Quantize a block output for chaining (emitted at the producer so
    the inter-block tensor is int8)."""
    q = jnp.clip(jnp.round(y.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def calibrate_conv_scales(apply_fn: Callable, variables,
                          batches: Iterable[Array],
                          max_batches: int = 100) -> Dict[str, float]:
    """Per-conv INPUT absmax scales via the `intermediates` collection
    (ConvBNAct sows 'in_absmax'). apply_fn(variables, batch, mutable) must
    forward `mutable` to model.apply and return (out, mutated_vars).
    Returns {module_path: absmax/127}."""
    maxima: Dict[str, float] = {}

    def walk(node, path):
        for k, v in node.items():
            if k == "in_absmax":
                vals = v if isinstance(v, (tuple, list)) else (v,)
                m = max(float(jnp.max(jnp.asarray(x))) for x in vals)
                maxima[path] = max(maxima.get(path, 0.0), m)
            elif hasattr(v, "items"):
                walk(v, f"{path}/{k}" if path else k)

    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        _, mut = apply_fn(variables, batch, ["intermediates"])
        walk(mut["intermediates"], "")
    return {k: v / 127.0 for k, v in maxima.items()}


def _quantize_kernel(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8. Conv kernels are HWIO (last dim
    = out channels); dense kernels are (in, out)."""
    axes = tuple(range(w.ndim - 1))
    absmax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params_int8(params) -> Dict:
    """Returns a pytree mirroring params where each 'kernel' leaf becomes
    {'q': int8 values, 'scale': f32 per-channel scales}; other leaves are
    kept in f32."""
    def walk(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            out = {}
            for k, v in node.items():
                if k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2:
                    q, s = _quantize_kernel(np.asarray(v))
                    out[k] = {"q": q, "scale": s}
                else:
                    out[k] = walk(v)
            return out
        return np.asarray(node)
    return walk(params)


def dequantize_params(qparams) -> Dict:
    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"q", "scale"}:
                return (node["q"].astype(np.float32) * node["scale"]
                        ).astype(np.float32)
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(qparams)


def fake_quant_params(params) -> Dict:
    """Quantize -> dequantize: f32 params numerically identical to the
    int8 deployment."""
    return dequantize_params(quantize_params_int8(params))


def fake_quant_ste(w: Array) -> Array:
    """Per-output-channel symmetric int8 fake quantization with a
    straight-through gradient estimator — the QAT building block
    (reference QAT: fuse + prepare_qat, KeypointNetwithIOLoss.py:377-381).
    Forward sees the quantized weights; the gradient passes through."""
    axes = tuple(range(w.ndim - 1))
    absmax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(w), axis=axes, keepdims=True))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127) * scale
    return w + jax.lax.stop_gradient(q - w)


def qat_params(params):
    """Apply fake_quant_ste to every kernel leaf (QAT training mode)."""
    def walk(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            return {k: (fake_quant_ste(v)
                        if k == "kernel" and hasattr(v, "ndim")
                        and v.ndim >= 2 else walk(v))
                    for k, v in node.items()}
        return node
    return walk(params)


def calibrate_activation_scales(apply_fn: Callable, variables,
                                batches: Iterable[Array],
                                max_batches: int = 100) -> Dict[str, float]:
    """Per-output absmax over calibration data (quantize.py:7-15 analog).
    apply_fn(variables, batch) must return a dict of activations."""
    scales: Dict[str, float] = {}
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        out = apply_fn(variables, batch)
        for k, v in out.items():
            m = float(jnp.max(jnp.abs(v)))
            scales[k] = max(scales.get(k, 0.0), m)
    return {k: v / 127.0 for k, v in scales.items()}


def int8_size_bytes(qparams) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(qparams):
        total += np.asarray(leaf).nbytes
    return total
