"""Jitted multitask train step with data-parallel sharding.

TPU-native replacement for the reference's eager loop
(train_multitask.py:510-525: autocast forward, GradScaler backward,
clip 1.0, optimizer step): here the two forward passes, every loss, the
gradient, clipping and the optimizer update compile into ONE XLA program,
with donated buffers and batch sharded over the mesh "data" axis; XLA
inserts the gradient all-reduce over ICI from the sharding annotations.
bf16 compute replaces AMP+GradScaler (no scaler needed: master params are
f32 and bf16 has the same exponent range as f32).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..configs import KP2DTinyConfig
from ..models.inlier_net import InlierNet
from ..ops.postprocess import post_process
from .multitask_loss import LossWeights, multitask_loss

Array = jnp.ndarray


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    io_params: Any
    io_batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(
            grads, self.opt_state,
            {"model": self.params, "io": self.io_params})
        new = optax.apply_updates({"model": self.params,
                                   "io": self.io_params}, updates)
        return self.replace(step=self.step + 1, params=new["model"],
                            io_params=new["io"], opt_state=new_opt)


def create_train_state(model, cfg: KP2DTinyConfig, rng: jax.Array,
                       input_shape: Tuple[int, int, int, int],
                       tx: optax.GradientTransformation,
                       with_io: bool = True,
                       io_top_k: int = 300) -> Tuple[TrainState, Optional[InlierNet]]:
    p_rng, d_rng, io_rng = jax.random.split(rng, 3)
    variables = model.init({"params": p_rng, "dropout": d_rng},
                           jnp.zeros(input_shape, jnp.float32), True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())

    io_net = InlierNet(blocks=4) if with_io else None
    if with_io:
        io_vars = io_net.init({"params": io_rng},
                              jnp.zeros((1, io_top_k, 5), jnp.float32), True)
        io_params = io_vars["params"]
        io_batch_stats = io_vars.get("batch_stats", FrozenDict())
    else:
        io_params, io_batch_stats = FrozenDict(), FrozenDict()

    opt_state = tx.init({"model": params, "io": io_params})
    state = TrainState(step=jnp.int32(0), params=params,
                       batch_stats=batch_stats, io_params=io_params,
                       io_batch_stats=io_batch_stats, opt_state=opt_state,
                       tx=tx)
    return state, io_net


def make_train_step(model, cfg: KP2DTinyConfig, H: int, W: int,
                    io_net: Optional[InlierNet] = None,
                    train_flags: Optional[Dict[str, bool]] = None,
                    io_top_k: int = 300, qat: bool = False,
                    donate: bool = True, watch_gradients: bool = False,
                    jit_compile: bool = True):
    """Returns train_step(state, batch, weights, rng) -> (state, metrics).

    batch: image/image_aug (B,H,W,3) in [-1,1], seg/seg_aug (B,hs,ws) int32,
    homography (B,3,3), optional depth/depth_aug (B,hs,ws,1).
    qat: int8 fake-quantize every kernel in the forward pass with a
    straight-through gradient (QAT; reference init_qat,
    KeypointNetwithIOLoss.py:377-381).
    jit_compile=False returns the UNJITTED step body for embedding inside
    a larger program (train/scan_epoch.py scans it over a whole epoch).
    """

    def loss_fn(trainable, batch_stats, io_batch_stats, batch, rng,
                weights: LossWeights):
        params, io_params = trainable["model"], trainable["io"]
        if qat:
            from ..quant import qat_params

            params = qat_params(params)
        rng_aug, rng_clean, rng_io = jax.random.split(rng, 3)

        # two forward passes, aug first, threading BN stat updates in the
        # reference's order (KeypointNetwithIOLoss.py:418-421)
        out_aug, mut1 = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image_aug"], True, rngs={"dropout": rng_aug},
            mutable=["batch_stats"])
        out, mut2 = model.apply(
            {"params": params, "batch_stats": mut1["batch_stats"]},
            batch["image"], True, rngs={"dropout": rng_clean},
            mutable=["batch_stats"])
        new_stats = mut2["batch_stats"]

        out_aug = post_process(out_aug, H, W, cfg.cell, cfg.cross_ratio,
                               eval_mode=False)
        out = post_process(out, H, W, cfg.cell, cfg.cross_ratio,
                           eval_mode=False)

        io_apply = None
        new_io_stats = io_batch_stats
        io_state = {}
        if io_net is not None:
            def io_apply(io_p, point_pair):
                pred, mut = io_net.apply(
                    {"params": io_p, "batch_stats": io_batch_stats},
                    point_pair, True, mutable=["batch_stats"])
                io_state["new_stats"] = mut["batch_stats"]
                return pred

        n_cells = (H // cfg.cell) * (W // cfg.cell)
        total, loss_dict = multitask_loss(
            out, out_aug, batch, H, W, weights,
            io_net_apply=io_apply, io_params=io_params,
            train_flags=train_flags, io_top_k=min(io_top_k, n_cells))
        if io_net is not None and "new_stats" in io_state:
            new_io_stats = io_state["new_stats"]
        return total, (new_stats, new_io_stats, loss_dict)

    def train_step(state: TrainState, batch, weights: LossWeights,
                   rng: jax.Array):
        trainable = {"model": state.params, "io": state.io_params}
        (loss, (new_stats, new_io_stats, loss_dict)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, state.batch_stats, state.io_batch_stats,
                batch, rng, weights)
        new_state = state.replace(batch_stats=new_stats,
                                  io_batch_stats=new_io_stats)
        new_state = new_state.apply_gradients(grads)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        if watch_gradients:
            # per-top-level-module gradient norms: the file-sink analog of
            # the reference's wandb.watch(model, log="all")
            # (train_multitask.py:629)
            for mod, sub in grads["model"].items():
                metrics[f"grad_norm/{mod}"] = optax.global_norm(sub)
        return new_state, metrics

    if not jit_compile:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_optimizer(name: str = "adam", lr=3e-4, weight_decay: float = 1e-5,
                   grad_clip: float = 1.0, schedule=None,
                   freeze_backbone: bool = False, plateau: bool = False
                   ) -> optax.GradientTransformation:
    """Optimizer factory matching train_multitask.py:371-396 options
    (adam | adamw | sgd). Gradients are clipped BY VALUE at 1.0 like the
    reference's clip_grad_value_ (:516). freeze_backbone zeroes backbone
    grads (reference freeze_backbone, kp2dtiny.py:499-502).

    plateau=True makes the learning rate a runtime hyperparameter
    (optax.inject_hyperparams) so a host-side plateau controller can lower
    it between epochs without recompiling (reference ReduceLROnPlateau,
    train_multitask.py:386-388); mutate with set_learning_rate()."""

    def build(learning_rate) -> optax.GradientTransformation:
        if name == "adam":
            opt = optax.adam(learning_rate)
        elif name == "adamw":
            opt = optax.adamw(learning_rate, weight_decay=weight_decay)
        elif name == "sgd":
            opt = optax.sgd(learning_rate, momentum=0.9)
        else:
            raise ValueError(name)
        # zero_nans: a rare numerical blowup (e.g. a degenerate homography)
        # must not poison the whole run — torch's norm subgradient
        # conventions give the reference similar de-facto protection
        parts = [optax.zero_nans(), optax.clip(grad_clip), opt]
        if freeze_backbone:
            def mask_fn(tree):
                def walk(node, frozen):
                    if isinstance(node, dict) or hasattr(node, "items"):
                        return {k: walk(v, frozen or k == "backbone")
                                for k, v in node.items()}
                    return not frozen
                return walk(tree, False)
            parts.append(optax.masked(
                optax.set_to_zero(), mask_fn_to_inverse(mask_fn)))
        return optax.chain(*parts)

    if plateau:
        return optax.inject_hyperparams(build)(learning_rate=float(lr))
    return build(schedule if schedule is not None else lr)


def set_learning_rate(state: "TrainState", lr: float) -> "TrainState":
    """Replace the injected learning_rate in a plateau optimizer's state."""
    opt_state = state.opt_state
    if not hasattr(opt_state, "hyperparams"):
        raise ValueError("optimizer was not built with plateau=True")
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def get_learning_rate(state: "TrainState") -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def mask_fn_to_inverse(mask_fn):
    def inv(tree):
        return jax.tree_util.tree_map(lambda b: not b, mask_fn(tree))
    return inv
