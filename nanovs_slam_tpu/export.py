"""Model export: StableHLO (native) and TF SavedModel (via jax2tf).

Replaces the reference's ONNX path (export_onnx.py:70-79: opset-16 export
of [score, coord, desc, vlad, seg]) with the JAX-native equivalents:
- StableHLO via jax.export — the portable compiler-level artifact.
- TF SavedModel via jax.experimental.jax2tf — loadable by TF Serving /
  TFLite converters (the deployment role ONNX played for the reference).
`to_export` (strip the NetVLAD aggregation, kp2dtiny.py:276-278) is
honored through the config flag like the reference.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import KP2DTinyConfig
from .ops.postprocess import post_process


def make_export_fn(model, cfg: KP2DTinyConfig, H: int, W: int,
                   eval_mode: bool = True):
    """Jittable fn(variables, images) -> (score, coord, feat, vlad, seg)
    matching the reference ONNX output list (export_onnx.py:70-79)."""

    def fn(variables, images):
        out = model.apply(variables, images, False)
        post = post_process(out, H, W, cfg.cell, cfg.cross_ratio,
                            eval_mode=eval_mode)
        return (post["score"], post["coord"], post["feat"], post["vlad"],
                post["seg"])

    return fn


def export_stablehlo(model, cfg: KP2DTinyConfig, variables, H: int, W: int,
                     path: str, batch: int = 1) -> str:
    """Serialize the inference program as StableHLO bytes."""
    from jax import export as jax_export

    fn = make_export_fn(model, cfg, H, W)
    closed = jax.jit(lambda images: fn(variables, images))
    exported = jax_export.export(closed)(
        jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32))
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_savedmodel(model, cfg: KP2DTinyConfig, variables, H: int, W: int,
                      path: str, batch: int = 1) -> Optional[str]:
    """TF SavedModel export via jax2tf (None if TF unavailable)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception:
        return None

    fn = make_export_fn(model, cfg, H, W)
    tf_fn = tf.function(
        jax2tf.convert(lambda images: fn(variables, images),
                       with_gradient=False),
        input_signature=[tf.TensorSpec((batch, H, W, 3), tf.float32)],
        autograph=False)
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, path)
    return path
