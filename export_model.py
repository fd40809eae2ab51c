#!/usr/bin/env python
"""Export CLI: StableHLO / TF SavedModel / int8 weights.

CLI contract mirrors the reference export_onnx.py + quantize.py: pick a
config (optionally --to_mcu / --to_export), load a checkpoint, export the
inference program with outputs [score, coord, feat, vlad, seg].
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="S")
    p.add_argument("--model_type", default="KP2DtinyV2")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--model_path", default=None)
    p.add_argument("--im_h", type=int, default=240)
    p.add_argument("--im_w", type=int, default=320)
    p.add_argument("--to_mcu", action="store_true")
    p.add_argument("--to_export", action="store_true",
                   help="strip the NetVLAD aggregation (reference contract)")
    p.add_argument("--format", default="stablehlo",
                   choices=["stablehlo", "savedmodel", "int8", "mcu"])
    p.add_argument("--out", default="exported_model")
    p.add_argument("--calib_images", type=int, default=8,
                   help="mcu format: random calibration batches for int8 "
                        "activation scales (0 = f32 bundle)")
    return p.parse_args()


def main():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.export import export_savedmodel, export_stablehlo
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model

    args = parse_args()
    v3 = args.model_type in ("KP2DtinyV3", "DF")
    cfg = get_config(args.config, v3=v3, n_classes=args.n_classes,
                     to_mcu=args.to_mcu, to_export=args.to_export)
    model = build_model(cfg)
    H, W = args.im_h, args.im_w
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    if args.model_path:
        if os.path.isdir(args.model_path) or args.model_path.endswith(".npz"):
            from nanovs_slam_tpu.utils.checkpoint import load_checkpoint

            tree, _ = load_checkpoint(args.model_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:
            from nanovs_slam_tpu.utils.torch_import import \
                load_torch_checkpoint

            params, batch_stats, _ = load_torch_checkpoint(args.model_path)
    variables = {"params": params, "batch_stats": batch_stats}

    if args.format == "stablehlo":
        out = export_stablehlo(model, cfg, variables, H, W,
                               args.out + ".stablehlo")
        print(f"StableHLO written to {out} "
              f"({os.path.getsize(out) / 1e6:.2f} MB)")
    elif args.format == "savedmodel":
        out = export_savedmodel(model, cfg, variables, H, W, args.out)
        print(f"SavedModel written to {out}" if out
              else "TF/jax2tf unavailable")
    elif args.format == "int8":
        import pickle

        from nanovs_slam_tpu.quant import int8_size_bytes, quantize_params_int8

        q = quantize_params_int8(params)
        path = args.out + ".int8.pkl"
        with open(path, "wb") as f:
            pickle.dump({"qparams": q, "batch_stats":
                         jax.tree_util.tree_map(np.asarray, batch_stats),
                         "config": cfg.name}, f)
        print(f"int8 weights written to {path} "
              f"({int8_size_bytes(q) / 1e6:.2f} MB)")
    elif args.format == "mcu":
        # ExecuTorch-analog deployment artifact (reference quantize.py:18-56
        # -> model.pte): one self-describing .nvsb file executed by the
        # dependency-free C runtime in native/mcu_runtime.c.
        from nanovs_slam_tpu.deploy import export_mcu_bundle
        from nanovs_slam_tpu.quant import calibrate_conv_scales

        if not args.to_mcu:
            # the bundle op set is the MCU deployment variant; a
            # pixelshuffle checkpoint has no transposed_conv params to
            # bundle, so this must be explicit rather than auto-converted
            raise SystemExit("--format mcu requires --to_mcu (the bundle "
                             "serializes the convtranspose deploy graph)")

        scales = None
        if args.calib_images > 0:
            rs = np.random.RandomState(0)

            def apply_fn(v, batch, mutable):
                return model.apply(v, batch, False, mutable=mutable,
                                   heads=("score", "loc", "desc"))

            batches = [rs.rand(1, H, W, 3).astype(np.float32)
                       for _ in range(args.calib_images)]
            scales = calibrate_conv_scales(apply_fn, variables, batches)
        path = args.out + ".nvsb"
        export_mcu_bundle(params, batch_stats, cfg, path, scales=scales)
        print(f"MCU bundle written to {path} "
              f"({os.path.getsize(path) / 1e6:.3f} MB, "
              f"{'int8' if scales else 'f32'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
