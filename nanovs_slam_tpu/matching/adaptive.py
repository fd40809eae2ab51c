"""Host-selected adaptive-depth LightGlue (real early exit).

The reference's early exit (lightglue/lightglue.py:560-638) breaks out of
the layer loop in Python — impossible inside one fixed XLA program without
wasting the skipped layers' compute (the value-level path in
matching/lightglue.py runs every layer and masks results). The TPU-native
answer: compile each stage as its OWN XLA program and let the host decide
how deep to go. Descriptors stay resident on device between programs; the
only device->host traffic per layer is ONE scalar (the confident-token
ratio). Skipped layers are never dispatched, so their compute is actually
saved — at the cost of one scalar-fetch sync per executed layer, which is
what the accompanying benchmark (bench_latency.py --adaptive) measures
against the static-depth program.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax

from .lightglue import LightGlue


class AdaptiveLightGlue:
    """Wraps a LightGlue module + params with per-stage jitted programs.

    Usage:
        alg = AdaptiveLightGlue(model, params, depth_confidence=0.95)
        pred = alg(data)   # data as for LightGlue.__call__
        pred["exit_layer"] -> layer index actually used (0-based)
    """

    def __init__(self, model: LightGlue, params,
                 depth_confidence: float = 0.95):
        self.model = model
        self.variables = {"params": params}
        self.depth_confidence = depth_confidence
        self.n_layers = model.cfg.n_layers
        m = model

        self._embed = jax.jit(
            lambda v, data: m.apply(v, data, method="embed"))
        self._layer = [
            jax.jit(functools.partial(
                lambda v, d0, d1, e0, e1, m0, m1, i: m.apply(
                    v, i, d0, d1, e0, e1, m0, m1, method="run_layer"), i=i))
            for i in range(self.n_layers)]
        self._ratio = [
            jax.jit(functools.partial(
                lambda v, d0, d1, i: m.apply(v, i, d0, d1,
                                             method="stop_ratio"), i=i))
            for i in range(self.n_layers - 1)]
        self._final = [
            jax.jit(functools.partial(
                lambda v, d0, d1, m0, m1, i: m.apply(
                    v, i, d0, d1, m0, m1, method="finalize"), i=i))
            for i in range(self.n_layers)]

    def warmup(self, data: Dict) -> None:
        """Compile every stage (all exit depths) ahead of time."""
        d0, d1, e0, e1 = self._embed(self.variables, data)
        m0, m1 = data.get("mask0"), data.get("mask1")
        for i in range(self.n_layers):
            d0, d1 = self._layer[i](self.variables, d0, d1, e0, e1, m0, m1)
            if i < self.n_layers - 1:
                self._ratio[i](self.variables, d0, d1)
            self._final[i](self.variables, d0, d1, m0, m1)

    def __call__(self, data: Dict, max_depth: Optional[int] = None) -> Dict:
        v = self.variables
        mask0, mask1 = data.get("mask0"), data.get("mask1")
        desc0, desc1, enc0, enc1 = self._embed(v, data)
        depth = self.n_layers if max_depth is None else max_depth
        exit_layer = depth - 1
        for i in range(depth):
            desc0, desc1 = self._layer[i](v, desc0, desc1, enc0, enc1,
                                          mask0, mask1)
            if i < depth - 1:
                # the ONLY sync point: one scalar over the wire
                if float(self._ratio[i](v, desc0, desc1)) \
                        > self.depth_confidence:
                    exit_layer = i
                    break
        pred = dict(self._final[exit_layer](v, desc0, desc1, mask0, mask1))
        pred["exit_layer"] = exit_layer
        return pred


def early_exit_forward(model: LightGlue, params, data: Dict,
                       depth_confidence: float = 0.95) -> Dict:
    """Fully IN-GRAPH early exit: ONE XLA program, `lax.while_loop` over
    layers with the confidence predicate in the carry (reference
    check_if_stop, lightglue.py:627-638; exit-layer assignment head
    :560-563 like the host-staged runner above).

    Trade-off vs AdaptiveLightGlue: no host round-trips at all (the
    host-staged runner pays one scalar-fetch RTT per executed layer —
    ~25-30 ms each over a tunneled backend), but the while_loop carries
    full-size descriptors and XLA cannot overlap across iterations; all
    n layer branches + n finalize branches are compiled into the one
    program (compile cost ~2x static). Use this on RTT-bound
    deployments; use AdaptiveLightGlue where the device is local and
    dispatch is cheap; use the static forward when n_layers is already
    small (see docs/KERNELS.md 'adaptive depth boundary').

    Jittable; returns the finalize() dict + "exit_layer" (0-based,
    traced int32).
    """
    import jax.numpy as jnp

    v = {"params": params}
    cfg = model.cfg
    n = cfg.n_layers
    if n < 2:
        pred = dict(model.apply(v, 0, *model.apply(v, data, method="embed")[:2],
                                data.get("mask0"), data.get("mask1"),
                                method="finalize"))
        pred["exit_layer"] = jnp.int32(0)
        return pred
    desc0, desc1, enc0, enc1 = model.apply(v, data, method="embed")
    mask0, mask1 = data.get("mask0"), data.get("mask1")

    def layer_fn(i):
        return lambda d0, d1: model.apply(v, i, d0, d1, enc0, enc1,
                                          mask0, mask1, method="run_layer")

    def ratio_fn(i):
        return lambda d0, d1: model.apply(v, i, d0, d1,
                                          method="stop_ratio")

    def final_fn(i):
        return lambda d0, d1: model.apply(v, i, d0, d1, mask0, mask1,
                                          method="finalize")

    layer_fns = [layer_fn(i) for i in range(n)]
    ratio_fns = [ratio_fn(i) for i in range(n - 1)]
    final_fns = [final_fn(i) for i in range(n)]

    def cond(c):
        i, _, _, done = c
        return jnp.logical_and(i < n, jnp.logical_not(done))

    def body(c):
        i, d0, d1, _ = c
        d0, d1 = jax.lax.switch(i, layer_fns, d0, d1)
        # no confidence head after the last layer: clamp the switch index
        # and force done there
        ratio = jax.lax.switch(jnp.minimum(i, n - 2), ratio_fns, d0, d1)
        done = jnp.where(i < n - 1, ratio > depth_confidence, True)
        return (i + jnp.int32(1), d0, d1, done)

    i, d0, d1, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), desc0, desc1, jnp.asarray(False)))
    exit_layer = i - 1
    pred = dict(jax.lax.switch(exit_layer, final_fns, d0, d1))
    pred["exit_layer"] = exit_layer
    return pred
