"""Import reference/official LightGlue torch checkpoints into our pytree.

Name mapping (reference lightglue/lightglue.py module tree):
  posenc.Wr.weight                    -> posenc/Wr (transposed)
  transformers.{i}.self_attn.Wqkv     -> transformers_{i}/self_attn/Wqkv
  ...ffn.0 / ffn.1(LayerNorm) / ffn.3 -> ffn/fc1 / ffn/norm / ffn/fc2
  log_assignment.{i}.matchability     -> log_assignment_{i}/matchability
  token_confidence.{i}.token.0        -> token_confidence_{i}/token
Linear weights transpose (out,in) -> (in,out); LayerNorm weight/bias ->
scale/bias.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_lightglue_state_dict(state_dict: Mapping[str, Any]) -> Dict:
    params: Dict = {}
    for name, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        arr = arr.astype(np.float32)
        parts = name.split(".")

        # collapse "modulelist.{i}" -> "modulelist_{i}"
        out = []
        i = 0
        while i < len(parts):
            if (parts[i] in ("transformers", "log_assignment",
                             "token_confidence") and i + 1 < len(parts)
                    and parts[i + 1].isdigit()):
                out.append(f"{parts[i]}_{parts[i + 1]}")
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out

        # ffn sequential indices
        joined = ".".join(parts)
        joined = (joined.replace("ffn.0", "ffn.fc1")
                  .replace("ffn.1", "ffn.norm")
                  .replace("ffn.3", "ffn.fc2")
                  .replace("token.0", "token"))
        parts = joined.split(".")
        leaf = parts[-1]
        mods = parts[:-1]

        if mods[-1:] == ["Wr"] and leaf == "weight":
            # posenc.Wr is a bare matmul param in our module, not a Dense
            _set(params, tuple(mods), arr.T)
            continue

        is_norm = len(mods) >= 1 and mods[-1] == "norm"
        if leaf == "weight":
            if is_norm:
                _set(params, tuple(mods) + ("scale",), arr)
            elif arr.ndim == 2:
                _set(params, tuple(mods) + ("kernel",), arr.T)
            else:
                _set(params, tuple(mods) + ("kernel",), arr)
        elif leaf == "bias":
            _set(params, tuple(mods) + ("bias",), arr)
        else:
            raise ValueError(f"unhandled lightglue entry {name}")
    return params
