"""Import torch KP2DTiny checkpoints into nanovs_slam_tpu pytrees.

Maps reference state_dict names (src/kp2dtiny/models/kp2dtiny.py module
tree) onto our flax variable tree, transposing conv kernels OIHW -> HWIO.
This enables bit-level output-fidelity validation against the reference
(descriptor cosine >= 0.999 target) and lets users of the reference bring
their trained weights.

The translation is rule-based on name structure, not a hardcoded list, so
it covers every config (V2/V3, attention, gem/convap, depth, MCU).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _tconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> (kH, kW, O, I) for
    lax.conv_transpose(transpose_kernel=True) (verified numerically:
    max err 1e-7 vs torch for k3 s2 p1 op1)."""
    return np.transpose(w, (2, 3, 1, 0))


def _rename_module(parts):
    """Reference module-path quirks -> our names."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "confAa":
            p = "convAa"
        elif p == "confBb":
            p = "convBb"
        elif p == "convs" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"convs_{parts[i + 1]}")
            i += 2
            continue
        elif p == "upsample":
            p = "upsample1"
        out.append(p)
        i += 1
    return out


# Attention submodule renames: reference PreNorm wrapping
#   att.norm -> norm_att, att.fn -> att, mff.norm -> norm_mff, mff.fn -> mff
# MixFeedForward sequential: net.0 -> expand, net.1.net.0 -> dw,
#   net.1.net.1 -> pw, net.3 -> project
def _rewrite_attention_path(name: str) -> str:
    # order matters: nested DsConv2d paths first
    for a, b in [
        ("att.norm.", "norm_att."),
        ("mff.norm.", "norm_mff."),
        ("att.fn.", "att."),
        ("mff.fn.", "mff."),
        ("mff.net.1.net.0.", "mff.dw."),
        ("mff.net.1.net.1.", "mff.pw."),
        ("mff.net.0.", "mff.expand."),
        ("mff.net.3.", "mff.project."),
    ]:
        name = name.replace(a, b)
    return name


def convert_state_dict(state_dict: Mapping[str, Any]
                       ) -> Tuple[Dict, Dict]:
    """Convert a torch state_dict (tensor or ndarray values) into
    (params, batch_stats) nested dicts for flax apply."""
    params: Dict = {}
    batch_stats: Dict = {}

    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr

    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        if ".quant." in name or ".dequant." in name:
            continue
        name = _rewrite_attention_path(name)
        parts = name.split(".")
        leaf = parts[-1]
        mods = _rename_module(parts[:-1])
        arr = arr.astype(np.float32)

        if not mods:
            continue
        last = mods[-1]

        if last == "bn":
            if leaf == "weight":
                _set(params, tuple(mods) + ("scale",), arr)
            elif leaf == "bias":
                _set(params, tuple(mods) + ("bias",), arr)
            elif leaf == "running_mean":
                _set(batch_stats, tuple(mods) + ("mean",), arr)
            elif leaf == "running_var":
                _set(batch_stats, tuple(mods) + ("var",), arr)
            continue

        if last == "netvlad":
            # GeM p parameter
            if leaf == "p":
                _set(params, tuple(mods) + ("p",), arr)
            elif leaf == "centroids":
                _set(params, tuple(mods) + ("centroids",), arr)
            continue

        if len(mods) >= 2 and mods[-2] == "netvlad" and last == "conv":
            # soft-assign 1x1 conv (K, C, 1, 1) -> assign_w (C, K)
            if leaf == "weight":
                w = arr[:, :, 0, 0].T  # (C, K)
                _set(params, tuple(mods[:-1]) + ("assign_w",), w)
            # vladv1 has no bias
            continue

        if len(mods) >= 2 and mods[-2] == "netvlad" and last == "channel_pool":
            # ConvAP 1x1 conv
            if leaf == "weight":
                _set(params, tuple(mods) + ("kernel",), _conv_kernel(arr))
            else:
                _set(params, tuple(mods) + ("bias",), arr)
            continue

        if last == "transposed_conv":
            # ConvTranspose weight (I, O, kH, kW) -> (kH, kW, O, I); same
            # axis permutation as OIHW->HWIO, consumed with
            # transpose_kernel=True (blocks.TransposedConvKernel)
            if leaf == "weight":
                _set(params, tuple(mods) + ("kernel",), _tconv_kernel(arr))
            continue

        if last == "centroids":
            _set(params, tuple(mods) + ("centroids",), arr)
            continue

        # LayerNorm g/b in attention: torch shape (1, C, 1, 1) -> (C,)
        if leaf in ("g", "b"):
            _set(params, tuple(mods) + (leaf,), arr.reshape(-1))
            continue

        if leaf == "weight":
            if arr.ndim == 4:
                # depthwise convs (groups=C) keep torch layout (O, I/g, H, W);
                # OIHW -> HWIO works for both regular and grouped convs.
                _set(params, tuple(mods) + ("kernel",), _conv_kernel(arr))
            elif arr.ndim == 2:
                _set(params, tuple(mods) + ("kernel",), arr.T)
            else:
                _set(params, tuple(mods) + ("kernel",), arr)
            continue
        if leaf == "bias":
            _set(params, tuple(mods) + ("bias",), arr)
            continue
        if leaf == "p":
            _set(params, tuple(mods) + ("p",), arr)
            continue

        raise ValueError(f"unhandled state_dict entry: {name} {arr.shape}")

    return params, batch_stats


def load_torch_checkpoint(path: str) -> Tuple[Dict, Dict, Dict]:
    """Load a reference .ckpt (torch.save dict with 'state_dict', 'config',
    ...; train_multitask.py:553-562) -> (params, batch_stats, config)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    # the training wrapper prefixes the model as 'keypoint_net.'
    sd = {k[len("keypoint_net."):] if k.startswith("keypoint_net.") else k: v
          for k, v in sd.items()}
    params, batch_stats = convert_state_dict(sd)
    return params, batch_stats, blob.get("config", {})


def convert_inlier_net_state_dict(sd):
    """torch InlierNet state_dict -> (params, batch_stats) for our
    models/inlier_net.InlierNet (reference src/kp2dtiny/models/
    inlier_net.py:11-50 layout: 1x1 convs + instance norms)."""
    def dense(w):  # (out, in, 1, 1) -> (in, out)
        return np.asarray(w)[:, :, 0, 0].T.astype(np.float32)

    p = {
        "p_in_conv": {"kernel": dense(sd["p_in.0.weight"])},
        "p_in_bn": {"scale": np.asarray(sd["p_in.1.weight"]),
                    "bias": np.asarray(sd["p_in.1.bias"])},
        "p_out": {"kernel": dense(sd["p_out.weight"]),
                  "bias": np.asarray(sd["p_out.bias"])},
    }
    bs = {
        "p_in_bn": {"mean": np.asarray(sd["p_in.1.running_mean"]),
                    "var": np.asarray(sd["p_in.1.running_var"])},
    }
    for i in range(4):
        p[f"b{i}_conv0"] = {"kernel": dense(sd[f"{i}s0.weight"]),
                            "bias": np.asarray(sd[f"{i}s0.bias"])}
        p[f"b{i}_bn0"] = {"scale": np.asarray(sd[f"{i}s1.weight"]),
                          "bias": np.asarray(sd[f"{i}s1.bias"])}
        p[f"b{i}_conv1"] = {"kernel": dense(sd[f"{i}s2.weight"]),
                            "bias": np.asarray(sd[f"{i}s2.bias"])}
        p[f"b{i}_bn1"] = {"scale": np.asarray(sd[f"{i}s3.weight"]),
                          "bias": np.asarray(sd[f"{i}s3.bias"])}
        bs[f"b{i}_bn0"] = {"mean": np.asarray(sd[f"{i}s1.running_mean"]),
                           "var": np.asarray(sd[f"{i}s1.running_var"])}
        bs[f"b{i}_bn1"] = {"mean": np.asarray(sd[f"{i}s3.running_mean"]),
                           "var": np.asarray(sd[f"{i}s3.running_var"])}
    return p, bs
