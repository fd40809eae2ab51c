"""Import reference KeypointFormer torch checkpoints.

Name mapping (reference src/kp2dtiny/models/kp2d_former.py +
models/segformer.py module tree -> our models/keypoint_former.py):
  mit.stages.{s}.1 (Unfold+1x1 embed)      -> mit/stage{s}_embed
      weight (out, in*k*k, 1, 1) reshaped to a k x k conv kernel
  mit.stages.{s}.2.{l}.0.norm              -> mit/stage{s}_l{l}_norm_att
  mit.stages.{s}.2.{l}.0.fn (attention)    -> mit/stage{s}_l{l}_att
  mit.stages.{s}.2.{l}.1.norm              -> mit/stage{s}_l{l}_norm_mff
  mit.stages.{s}.2.{l}.1.fn (MixFF)        -> mit/stage{s}_l{l}_mff
  to_fused.{i}.0 / .1                      -> to_fused{i}_conv / _bn
  segmentation_head.0/1/3                  -> seg_conv0 / seg_bn0 / seg_conv1
  score_head / loc_head / vlad_head        -> score_* / loc_* / vlad_*
  feat_head.0/1/3/4/6                      -> feat_conv0/bn0/conv1/bn1/conv2
  netvlad.conv / centroids                 -> netvlad assign_w/_b, centroids
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_STAGE_K = (7, 3, 3, 3)


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)


def convert_keypoint_former_state_dict(sd: Mapping[str, Any], num_layers=2
                                       ) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}

    def put_conv(mods, w, b=None):
        _set(params, tuple(mods) + ("kernel",), _conv(np.asarray(w)))
        if b is not None:
            _set(params, tuple(mods) + ("bias",), np.asarray(b, np.float32))

    def put_bn(mods, sdict, prefix):
        _set(params, tuple(mods) + ("scale",),
             np.asarray(sdict[prefix + ".weight"], np.float32))
        _set(params, tuple(mods) + ("bias",),
             np.asarray(sdict[prefix + ".bias"], np.float32))
        _set(stats, tuple(mods) + ("mean",),
             np.asarray(sdict[prefix + ".running_mean"], np.float32))
        _set(stats, tuple(mods) + ("var",),
             np.asarray(sdict[prefix + ".running_var"], np.float32))

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    # --- MiT stages ---
    for s in range(4):
        k = _STAGE_K[s]
        w = np.asarray(sd[f"mit.stages.{s}.1.weight"])  # (out, in*k*k, 1, 1)
        out_c = w.shape[0]
        in_c = w.shape[1] // (k * k)
        w = w[:, :, 0, 0].reshape(out_c, in_c, k, k)
        put_conv(["mit", f"stage{s}_embed"], w,
                 sd[f"mit.stages.{s}.1.bias"])
        for l in range(num_layers):
            base = f"mit.stages.{s}.2.{l}"
            for part, ours in ((f"{base}.0.norm", f"stage{s}_l{l}_norm_att"),
                               (f"{base}.1.norm", f"stage{s}_l{l}_norm_mff")):
                _set(params, ("mit", ours, "g"),
                     np.asarray(sd[part + ".g"]).reshape(-1))
                _set(params, ("mit", ours, "b"),
                     np.asarray(sd[part + ".b"]).reshape(-1))
            att = f"{base}.0.fn"
            ours_att = ("mit", f"stage{s}_l{l}_att")
            put_conv(ours_att + ("to_q",), sd[att + ".to_q.weight"])
            put_conv(ours_att + ("to_kv",), sd[att + ".to_kv.weight"])
            put_conv(ours_att + ("to_out",), sd[att + ".to_out.weight"])
            mff = f"{base}.1.fn.net"
            ours_mff = ("mit", f"stage{s}_l{l}_mff")
            put_conv(ours_mff + ("expand",), sd[mff + ".0.weight"],
                     sd[mff + ".0.bias"])
            put_conv(ours_mff + ("dw",), sd[mff + ".1.net.0.weight"],
                     sd[mff + ".1.net.0.bias"])
            put_conv(ours_mff + ("pw",), sd[mff + ".1.net.1.weight"],
                     sd[mff + ".1.net.1.bias"])
            put_conv(ours_mff + ("project",), sd[mff + ".3.weight"],
                     sd[mff + ".3.bias"])

    # --- fusion convs ---
    for i in range(4):
        put_conv([f"to_fused{i}_conv"], sd[f"to_fused.{i}.0.weight"],
                 sd[f"to_fused.{i}.0.bias"])
        put_bn([f"to_fused{i}_bn"], sd, f"to_fused.{i}.1")

    # --- heads (Sequential indices: conv, bn, relu, conv [,bn, relu, conv])
    def head(torch_name, ours, idxs_bn):
        conv_j = 0
        for seq in range(10):  # sequential has interleaved ReLU slots
            if f"{torch_name}.{seq}.running_mean" in sd:
                put_bn([f"{ours}_bn{conv_j - 1}"], sd, f"{torch_name}.{seq}")
            elif f"{torch_name}.{seq}.weight" in sd:
                put_conv([f"{ours}_conv{conv_j}"],
                         sd[f"{torch_name}.{seq}.weight"],
                         sd.get(f"{torch_name}.{seq}.bias"))
                conv_j += 1

    head("segmentation_head", "seg", None)
    head("score_head", "score", None)
    head("loc_head", "loc", None)
    head("feat_head", "feat", None)
    head("vlad_head", "vlad", None)

    # --- NetVLAD (vladv2: conv has bias) ---
    w = np.asarray(sd["netvlad.conv.weight"])[:, :, 0, 0]  # (K, C)
    _set(params, ("netvlad", "assign_w"), w.T.astype(np.float32))
    if "netvlad.conv.bias" in sd and sd["netvlad.conv.bias"] is not None:
        _set(params, ("netvlad", "assign_b"),
             np.asarray(sd["netvlad.conv.bias"], np.float32))
    _set(params, ("netvlad", "centroids"),
         np.asarray(sd["netvlad.centroids"], np.float32))
    return params, stats
