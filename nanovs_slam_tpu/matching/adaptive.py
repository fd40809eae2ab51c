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
