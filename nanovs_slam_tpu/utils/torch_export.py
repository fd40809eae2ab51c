"""Export nanovs_slam_tpu pytrees into torch KP2DTiny state_dicts.

The exact inverse of utils/torch_import.convert_state_dict: given our
(params, batch_stats) and a TEMPLATE torch state_dict (the target torch
model's own state_dict, which supplies the key names and shapes), produce
a state_dict loadable with load_state_dict(strict=True).

This is what makes pipeline-level parity runs possible (VERDICT r2 "Next
round" #1): checkpoints trained IN THIS FRAMEWORK are loaded into the
reference's torch stack (/root/reference/src) so the reference's own
eval/VO code runs with identical weights.

Correctness contract: tests/test_torch_export.py round-trips a random
torch state_dict through convert_state_dict -> export_state_dict and
asserts bitwise equality for every tensor.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .torch_import import _rename_module, _rewrite_attention_path


def _get(tree: Dict, path) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _inv_conv_kernel(w: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(w, (3, 2, 0, 1))


def _inv_tconv_kernel(w: np.ndarray) -> np.ndarray:
    """(kH, kW, O, I) -> (I, O, kH, kW)."""
    return np.transpose(w, (3, 2, 0, 1))


def export_state_dict(params: Mapping, batch_stats: Mapping,
                      template_sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Build a torch state_dict for the reference model from our trees.

    template_sd: the torch model's state_dict(); values are only used for
    dtype/shape of passthrough entries (num_batches_tracked, quant stubs).
    Returns numpy arrays keyed by the template's names; wrap with
    torch.from_numpy at the call site.
    """
    out: Dict[str, Any] = {}
    for name, tv in template_sd.items():
        tarr = tv.detach().cpu().numpy() if hasattr(tv, "detach") \
            else np.asarray(tv)
        if name.endswith("num_batches_tracked") or ".quant." in name \
                or ".dequant." in name:
            out[name] = tarr  # torch bookkeeping, no counterpart here
            continue
        rname = _rewrite_attention_path(name)
        parts = rname.split(".")
        leaf = parts[-1]
        mods = _rename_module(parts[:-1])
        if not mods:
            out[name] = tarr
            continue
        last = mods[-1]
        path, inv = None, None

        if last == "bn":
            if leaf == "weight":
                path, tree = tuple(mods) + ("scale",), params
            elif leaf == "bias":
                path, tree = tuple(mods) + ("bias",), params
            elif leaf == "running_mean":
                path, tree = tuple(mods) + ("mean",), batch_stats
            elif leaf == "running_var":
                path, tree = tuple(mods) + ("var",), batch_stats
            else:
                raise ValueError(f"unhandled bn leaf: {name}")
        elif last == "netvlad" and leaf in ("p", "centroids"):
            path, tree = tuple(mods) + (leaf,), params
        elif len(mods) >= 2 and mods[-2] == "netvlad" and last == "conv" \
                and leaf == "weight":
            path, tree = tuple(mods[:-1]) + ("assign_w",), params
            inv = lambda w: w.T[:, :, None, None]  # (C,K) -> (K,C,1,1)
        elif len(mods) >= 2 and mods[-2] == "netvlad" \
                and last == "channel_pool":
            if leaf == "weight":
                path, tree, inv = tuple(mods) + ("kernel",), params, \
                    _inv_conv_kernel
            else:
                path, tree = tuple(mods) + ("bias",), params
        elif last == "transposed_conv" and leaf == "weight":
            path, tree, inv = tuple(mods) + ("kernel",), params, \
                _inv_tconv_kernel
        elif last == "centroids":
            path, tree = tuple(mods) + ("centroids",), params
        elif leaf in ("g", "b"):
            path, tree = tuple(mods) + (leaf,), params
            inv = lambda a, shape=tarr.shape: a.reshape(shape)
        elif leaf == "weight":
            path, tree = tuple(mods) + ("kernel",), params
            if tarr.ndim == 4:
                inv = _inv_conv_kernel
            elif tarr.ndim == 2:
                inv = lambda a: a.T
        elif leaf == "bias":
            path, tree = tuple(mods) + ("bias",), params
        elif leaf == "p":
            path, tree = tuple(mods) + ("p",), params
        else:
            raise ValueError(f"unhandled state_dict entry: {name}")

        arr = _get(tree, path).astype(np.float32)
        if inv is not None:
            arr = inv(arr)
        if arr.shape != tarr.shape:
            raise ValueError(
                f"{name}: exported shape {arr.shape} != template "
                f"{tarr.shape}")
        out[name] = np.ascontiguousarray(arr)
    return out


def load_into_torch_model(tmodel, params: Mapping, batch_stats: Mapping):
    """Load our trees into a torch nn.Module in place; returns tmodel."""
    import torch

    sd = export_state_dict(params, batch_stats, tmodel.state_dict())
    tsd = {k: torch.from_numpy(np.asarray(v)) if not isinstance(
        v, torch.Tensor) else v for k, v in sd.items()}
    tmodel.load_state_dict(tsd, strict=True)
    return tmodel
