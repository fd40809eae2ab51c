"""Tensor parallelism (TP) for LightGlue attention.

Megatron-style head sharding expressed as GSPMD annotations: the packed
Wqkv projection is column-parallel (outputs sharded over heads — the torch
channel packing is head-major, matching/lightglue.py:134, so contiguous
output chunks are whole heads), out_proj/to_out are row-parallel (partial
sums all-reduced by XLA), and each device runs self/cross attention for
its own heads only. The FFN's fc1 is column-parallel and fc2 row-parallel;
the LayerNorm that the reference places between them normalizes over the
full hidden axis, so GSPMD inserts the mean/var all-reduces for it —
annotations never change semantics, only layout.

Use case: latency-bound matching of ONE image pair, where data parallelism
has no batch to shard. At K=512, d=256, the per-layer attention flops
(~2K^2 d + 4 K d^2) split h-ways with one all-reduce per projection.

No reference counterpart (single-GPU reference); tested for exact
agreement with the replicated program + presence of cross-device
collectives in the compiled HLO (tests/test_parallel_nd.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name suffix -> (kernel spec, bias/scale spec), megatron pattern
_COL = (P(None, "model"), P("model"))     # column-parallel: shard outputs
_ROW = (P("model", None), P())            # row-parallel: shard inputs
_TP_RULES = {
    "Wqkv": _COL, "to_qk": _COL, "to_v": _COL, "fc1": _COL,
    "out_proj": _ROW, "to_out": _ROW, "fc2": _ROW,
}


def lightglue_param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree for a LightGlue param tree (same structure)."""

    def spec_for(path, leaf) -> P:
        names = [getattr(k, "key", str(k)) for k in path]
        for i, name in enumerate(names):
            rule = _TP_RULES.get(name)
            if rule is None:
                continue
            kernel_spec, vector_spec = rule
            return kernel_spec if names[-1] == "kernel" else vector_spec
        if "norm" in names and names[0].startswith("transformers_"):
            # FFN LayerNorm scale/bias live on the fc1-sharded hidden axis
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_shard_variables(mesh: Mesh, variables: Dict) -> Dict:
    """Place LightGlue variables per the TP specs (params sharded,
    everything else replicated)."""
    specs = {k: (lightglue_param_specs(v) if k == "params"
                 else jax.tree_util.tree_map(lambda _: P(), v))
             for k, v in variables.items()}
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(variables, shardings)


def tp_lightglue_forward(mesh: Mesh, model, variables: Dict,
                         train: bool = False) -> Callable:
    """jit model.apply with head-sharded params; match inputs/outputs stay
    replicated (they are small relative to the attention compute)."""
    sharded_vars = tp_shard_variables(mesh, variables)
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fwd(v, data):
        return model.apply(v, data, train)

    def run(data: Dict[str, Any]):
        data = jax.device_put(data, rep)
        return fwd(sharded_vars, data)

    run.lowered = lambda data: fwd.lower(sharded_vars,
                                         jax.device_put(data, rep))
    return run
