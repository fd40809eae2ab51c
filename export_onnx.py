#!/usr/bin/env python
"""Export KP2DTiny to ONNX (reference /root/reference/export_onnx.py).

Same CLI surface and artifact contract as the reference: opset-16 ONNX
with input "image" (1, 3, H, W) and outputs score/coord/desc/vlad/seg
(+depth), default 120x160, --to_mcu (convtranspose upsample + ReLU) and
--to_export (strip NetVLAD aggregation) variants. The model graph is the
torch mirror of the flax architecture (utils/torch_mirror.py), loaded
directly from an orbax checkpoint's (params, batch_stats) — parity
mirror==flax is asserted by tests/test_torch_mirror.py.

This is the interchange artifact for MCU/edge toolchains; the TPU-native
deployment path remains StableHLO / TF SavedModel (export_model.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser(description="Export ONNX model")
    p.add_argument("--config", type=str, default="S")
    p.add_argument("--im_h", type=int, default=120)
    p.add_argument("--im_w", type=int, default=160)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--model_type", type=str, default="KP2Dtiny",
                   choices=["KP2Dtiny", "KP2DtinyV3", "KeypointFormer"])
    p.add_argument("--model_path", type=str, default="./checkpoints",
                   help="output directory")
    p.add_argument("--weight_path", type=str, default=None,
                   help="orbax checkpoint dir (random init if absent)")
    p.add_argument("--to_mcu", default=True,
                   type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--to_export", default=True,
                   type=lambda s: s not in ("0", "False", "false"))
    p.add_argument("--depth", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from nanovs_slam_tpu.utils.torch_mirror import export_onnx

    if args.model_type == "KeypointFormer":
        # the reference exports KeypointFormer with its DEFAULT_CONFIG
        # (export_onnx.py:61); --config selects our registry entry when
        # it names one ("default"/"tiny")
        import dataclasses

        from nanovs_slam_tpu.models.keypoint_former import (
            KEYPOINTFORMER_CONFIGS, KeypointFormer)
        from nanovs_slam_tpu.utils.torch_mirror import \
            build_keypoint_former_mirror

        kf_cfg = KEYPOINTFORMER_CONFIGS.get(
            args.config, KEYPOINTFORMER_CONFIGS["default"])
        kf_cfg = dataclasses.replace(kf_cfg, n_classes=args.n_classes)
        if args.weight_path:
            from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
            tree, _ = load_checkpoint(args.weight_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:
            model = KeypointFormer(kf_cfg)
            x = jax.numpy.zeros((1, args.im_h, args.im_w, 3))
            variables = model.init(jax.random.PRNGKey(0), x, train=True)
            params = variables["params"]
            batch_stats = variables["batch_stats"]
        mirror = build_keypoint_former_mirror(kf_cfg, params, batch_stats)
        name = "KeypointFormer.onnx"
    else:
        from nanovs_slam_tpu.configs import get_config
        from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
        from nanovs_slam_tpu.utils.torch_mirror import build_torch_mirror

        cfg = get_config(args.config, v3=args.model_type == "KP2DtinyV3",
                         n_classes=args.n_classes, to_mcu=args.to_mcu,
                         to_export=args.to_export, depth=args.depth)
        if args.weight_path:
            from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
            tree, _ = load_checkpoint(args.weight_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:
            model = build_model(cfg)
            params, batch_stats = init_model(
                model, jax.random.PRNGKey(0),
                (1, args.im_h, args.im_w, 3))
        mirror = build_torch_mirror(cfg, params, batch_stats)
        name = f"{args.model_type}_{args.config}.onnx"

    os.makedirs(args.model_path, exist_ok=True)
    out = export_onnx(mirror, os.path.join(args.model_path, name),
                      args.im_h, args.im_w)
    print(f"Model exported to {out}")


if __name__ == "__main__":
    main()
