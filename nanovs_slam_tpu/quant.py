"""Int8 quantization (PTQ) for KP2DTiny on TPU.

The reference's quantization stack is torch eager PTQ/QAT with
quant/dequant stubs bounding every conv block (quantize.py:59-70,
base.py:36-46, KeypointNetwithIOLoss.py:377-381). The TPU-native
equivalent implemented here:

- quantize_params_int8: per-output-channel symmetric int8 weight
  quantization of every conv/dense kernel, storing int8 values + f32
  scales (deployment artifact; int8 halves/quarters HBM traffic and
  feeds the MXU's int8 path).
- fake_quant_params: quantize->dequantize round trip producing f32
  params that behave like the int8 deployment — used to evaluate
  accuracy degradation exactly like the reference's PTQ eval path
  (eval_multitask.py:169-194 quantize-before-eval).
- calibrate_activation_scales: per-tensor absmax activation ranges over
  calibration batches (the reference calibrates 100 batches,
  quantize.py:7-15).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


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
