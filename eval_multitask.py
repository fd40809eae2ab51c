#!/usr/bin/env python
"""Multitask evaluation driver.

CLI contract mirrors the reference eval_multitask.py (task flags
--keypoints --visloc --segmentation --depth --vo, eval at 240x320,
top-k {300, 1000}, VO at (128,256)/(128,512)/(256,1024), results JSON).
Reference surface: eval_multitask.py:35-94 (argparse), :124-344 (driver).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate KP2DTiny multitask")
    p.add_argument("--model_path", default=None, help="checkpoint dir")
    p.add_argument("--config", default="S")
    p.add_argument("--model_type", default="KP2DtinyV2")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--dataset_config", default="datasets.json")
    p.add_argument("--keypoints", action="store_true")
    p.add_argument("--visloc", action="store_true")
    p.add_argument("--segmentation", action="store_true")
    p.add_argument("--depth", action="store_true")
    p.add_argument("--vo", action="store_true")
    p.add_argument("--vo_matcher", default="bf",
                   choices=["bf", "flann", "crosscheck", "semantic",
                            "lightglue", "dense"],
                   help="VO matching mode (reference visual_odometry "
                        "matcher conf; 'dense' = detector-free LoFTR-mode "
                        "counterpart, matching/dense.py)")
    p.add_argument("--lg_ckpt", default=None,
                   help="trained LightGlue checkpoint for --vo_matcher "
                        "lightglue")
    p.add_argument("--device_pose", action="store_true",
                   help="on-device LO-RANSAC pose instead of the host "
                        "cv2 tail (pose.ransac_essential_device)")
    p.add_argument("--lg_threshold", type=float, default=0.0,
                   help="LightGlue VO match filter threshold (reference "
                        "inference default 0.0, lightglue.py:430)")
    p.add_argument("--lg_width", type=float, default=-1.0,
                   help="LightGlue adaptive width pruning confidence "
                        "(<=0 disables; see vo_eval --lg_width)")
    p.add_argument("--top_k", type=int, nargs="+", default=[300, 1000])
    p.add_argument("--im_h", type=int, default=240)
    p.add_argument("--im_w", type=int, default=320)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas postprocess kernel")
    p.add_argument("--int8", action="store_true",
                   help="REAL int8 inference: calibrate activation scales, "
                        "then run every conv int8 on the MXU (reference "
                        "eval_multitask.py:169-194 / quantize.py:59-70)")
    p.add_argument("--int8_weight_only", action="store_true",
                   help="weight-only fake-quant eval (rounding error only)")
    p.add_argument("--calib_batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=42069,
                   help="random seed (reference eval_multitask.py:54)")
    p.add_argument("--wandb", action="store_true",
                   help="log results to wandb (JSONL fallback when wandb "
                        "is absent; reference eval_multitask.py:336-340)")
    p.add_argument("--out", default="eval_results.json")
    p.add_argument("--max_items", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="save prediction visualizations (keypoint "
                        "overlays, seg panels) to --result_dir — the "
                        "headless analog of the reference's cv2.imshow "
                        "debug flag (README.md:127-131)")
    p.add_argument("--result_dir", default="results",
                   help="where --debug writes PNGs (reference "
                        "--result_dir)")
    return p.parse_args()


def main():
    args = parse_args()
    from nanovs_slam_tpu.utils.seed import set_seed

    set_seed(args.seed)
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.datasets import load_datasets_json
    from nanovs_slam_tpu.inference import make_infer_fn
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
    from nanovs_slam_tpu.utils.logging import print_table

    H, W = args.im_h, args.im_w
    if args.model_type == "KeypointFormer":
        import dataclasses

        from nanovs_slam_tpu.models.keypoint_former import (
            KEYPOINTFORMER_CONFIGS, KeypointFormer)

        kf = args.config if args.config in KEYPOINTFORMER_CONFIGS else "tiny"
        cfg = dataclasses.replace(
            KEYPOINTFORMER_CONFIGS[kf], n_classes=args.n_classes,
            dtype="bfloat16" if args.bf16 else "float32")
        model = KeypointFormer(cfg)
    else:
        v3 = args.model_type in ("KP2DtinyV3", "DF")
        cfg = get_config(args.config, v3=v3, n_classes=args.n_classes,
                         depth=args.depth,
                         dtype="bfloat16" if args.bf16 else "float32")
        model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    if args.model_path:
        if os.path.isdir(args.model_path) or \
                args.model_path.endswith(".npz"):
            tree, _ = load_checkpoint(args.model_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:  # torch .ckpt import
            from nanovs_slam_tpu.utils.torch_import import \
                load_torch_checkpoint

            params, batch_stats, _ = load_torch_checkpoint(args.model_path)
    if args.int8_weight_only:
        from nanovs_slam_tpu.quant import fake_quant_params

        params = fake_quant_params(params)
        print("evaluating with int8 fake-quantized weights (weight-only)")
    variables = {"params": params, "batch_stats": batch_stats}

    int8_scales = None
    if args.int8:
        from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
        from nanovs_slam_tpu.quant import calibrate_conv_scales

        calib = SyntheticShapesDataset((H, W), args.calib_batches,
                                       args.n_classes, seed=3)
        batches = [np.asarray(calib[i]["image"][None] * 2.0 - 1.0,
                              np.float32) for i in range(len(calib))]

        def apply_fn(v, batch, mutable):
            import jax.numpy as jnp

            return model.apply(v, jnp.asarray(batch), False,
                               mutable=mutable)

        int8_scales = calibrate_conv_scales(apply_fn, variables, batches,
                                            max_batches=args.calib_batches)
        print(f"int8 inference: {len(int8_scales)} convs calibrated")
    paths = load_datasets_json(args.dataset_config)

    results = {}

    if args.keypoints:
        from nanovs_slam_tpu.data.hpatches import (HPatchesDataset,
                                                   ensure_synthetic_hpatches)
        from nanovs_slam_tpu.evaluation.keypoints import evaluate_keypoint_net

        root = paths.get("hpatches_data_path")
        if not (root and os.path.isdir(root)):
            print("hpatches_data_path missing; using the synthetic "
                  "discriminative fixture (40 graded-warp pairs)")
            root = ensure_synthetic_hpatches()
        if root and os.path.isdir(root):
            infer = make_infer_fn(model, cfg, H, W,
                                  use_pallas=True if args.use_pallas
                                  else "auto", int8_scales=int8_scales)

            def infer_np(images):
                out = infer(variables, images)
                return {k: np.asarray(v) for k, v in out.items()}

            ds = HPatchesDataset(root, (W, H))
            items = list(ds)[: args.max_items] if args.max_items else ds
            if args.debug:
                from nanovs_slam_tpu.evaluation.detector import \
                    warp_keypoints
                from nanovs_slam_tpu.utils.debug_viz import save_pair_debug

                for i, item in enumerate(items):
                    if i >= 4:
                        break
                    out0 = infer_np(item["image"])
                    out1 = infer_np(item["image_aug"])
                    kps0 = out0["coord"].reshape(-1, 2)
                    save_pair_debug(
                        os.path.join(args.result_dir,
                                     f"keypoints_{i}.png"),
                        item["image"], item["image_aug"], kps0,
                        out1["coord"].reshape(-1, 2),
                        kps0_warped=warp_keypoints(kps0,
                                                   item["homography"]),
                        scores0=out0["score"].reshape(-1),
                        scores1=out1["score"].reshape(-1))
            for k in args.top_k:
                try:
                    r = evaluate_keypoint_net(items, infer_np,
                                              output_shape=(W, H), top_k=k)
                    results[f"keypoints_top{k}"] = r
                    print_table({kk: vv for kk, vv in r.items()
                                 if not isinstance(vv, dict)},
                                f"keypoints top-{k}")
                except Exception as e:
                    results[f"keypoints_top{k}"] = {"error": str(e)}
        else:
            results["keypoints"] = {"error": "hpatches_data_path missing"}

    if args.segmentation:
        from nanovs_slam_tpu.data.datasets import (COCOStuffDataset,
                                                   CityscapesDataset)
        from nanovs_slam_tpu.evaluation.segmentation import \
            evaluate_segmentation

        ds = None
        if args.n_classes == 19 and paths.get("cityscapes_data_path"):
            ds = CityscapesDataset(paths["cityscapes_data_path"], (H, W),
                                   "val")
        elif paths.get("coco_data_path"):
            ds = COCOStuffDataset(paths["coco_data_path"], (H, W), "val",
                                  args.n_classes)
        if ds is not None and len(ds) > 0:
            infer = make_infer_fn(model, cfg, H, W,
                                  int8_scales=int8_scales)

            def seg_iter():
                n = min(len(ds), args.max_items or len(ds))
                for i in range(n):
                    item = ds[i]
                    import cv2

                    hs = 2 * (H // cfg.cell)
                    ws = 2 * (W // cfg.cell)
                    seg = cv2.resize(item["seg"], (ws, hs),
                                     interpolation=cv2.INTER_NEAREST)
                    yield {"image": item["image"][None] * 2 - 1,
                           "seg": seg[None]}

            def infer_np(images):
                import jax.numpy as jnp

                out = infer(variables, jnp.asarray(images, jnp.float32))
                return {k: np.asarray(v) for k, v in out.items()}

            if args.debug:
                from nanovs_slam_tpu.utils.debug_viz import save_seg_debug

                for i, batch in enumerate(seg_iter()):
                    if i >= 4:
                        break
                    out = infer_np(batch["image"])
                    save_seg_debug(
                        os.path.join(args.result_dir, f"seg_{i}.png"),
                        batch["image"], out["seg"][0],
                        batch["seg"][0], n_classes=args.n_classes)
            try:
                r = evaluate_segmentation(seg_iter(), infer_np,
                                          args.n_classes)
                results["segmentation"] = r
                print_table(r, "segmentation")
            except Exception as e:
                results["segmentation"] = {"error": str(e)}
        else:
            results["segmentation"] = {"error": "dataset missing"}

    if args.depth:
        from nanovs_slam_tpu.evaluation.depth import evaluate_depth
        from nanovs_slam_tpu.data.extra_datasets import NYUv2Dataset

        root = paths.get("nyuv2_data_path")
        if root and os.path.isdir(root):
            try:
                import cv2
                import jax.numpy as jnp

                ds = NYUv2Dataset(root, (H, W), split="test")
                infer = make_infer_fn(model, cfg, H, W,
                                      int8_scales=int8_scales)

                def infer_np(images):
                    out = infer(variables, jnp.asarray(images, jnp.float32))
                    return {k: np.asarray(v) for k, v in out.items()}

                def depth_iter():
                    hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
                    n = min(len(ds), args.max_items or len(ds))
                    for i in range(n):
                        item = ds[i]
                        if "depth" not in item:
                            continue
                        d = cv2.resize(item["depth"], (ws, hs),
                                       interpolation=cv2.INTER_NEAREST)
                        yield {"image": item["image"][None] * 2 - 1,
                               "depth": d[None, ..., None]}

                r = evaluate_depth(depth_iter(), infer_np)
                results["depth"] = r
                print_table(r, "depth")
            except Exception as e:
                results["depth"] = {"error": str(e)}
        else:
            results["depth"] = {"error": "nyuv2_data_path missing"}

    if args.visloc:
        from nanovs_slam_tpu.data.pittsburgh import WholeDataset
        from nanovs_slam_tpu.evaluation.global_descriptor import \
            evaluate_global_descriptor

        root = paths.get("pittsburgh_data_path")
        struct = os.path.join(root or "", "datasets", "pitts30k_val.mat")
        if root and not os.path.exists(struct):
            # synthetic fixture (scripts/make_synthetic_pittsburgh.py)
            # ships only the train split
            alt = os.path.join(root, "datasets", "pitts30k_train.mat")
            if os.path.exists(alt):
                print(f"pitts30k_val.mat missing; using {alt}")
                struct = alt
        if root and os.path.exists(struct):
            try:
                import jax.numpy as jnp

                ds = WholeDataset(struct, root, (H, W))
                infer = make_infer_fn(model, cfg, H, W,
                                  int8_scales=int8_scales)
                feats = []
                for i in range(len(ds)):
                    out = infer(variables, jnp.asarray(ds[i][None]))
                    feats.append(np.asarray(out["vlad"])[0])
                feats = np.stack(feats)
                db = feats[: ds.dbStruct.numDb]
                q = feats[ds.dbStruct.numDb:]
                r = evaluate_global_descriptor(db, q, ds.get_positives())
                results["visloc"] = r
                print(r)
            except Exception as e:
                results["visloc"] = {"error": str(e)}
        else:
            results["visloc"] = {"error": "pittsburgh_data_path missing"}

    if args.vo:
        from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
        from nanovs_slam_tpu.vo.visual_odometry import \
            evaluate_visual_odometry

        kitti = paths.get("kitti_data_path")
        if kitti and os.path.isdir(kitti):
            for vo_h, vo_w in [(128, 256), (128, 512), (256, 1024)]:
                try:
                    fe = KP2DTinyFrontend(
                        model, cfg, variables, (vo_h, vo_w), top_k=4000,
                        with_seg=args.vo_matcher == "semantic")
                    dense = None
                    if args.vo_matcher == "dense":
                        from nanovs_slam_tpu.matching.dense import \
                            DenseMatcher

                        dense = DenseMatcher(model, cfg, variables,
                                             (vo_h, vo_w))
                    r = evaluate_visual_odometry(
                        fe, kitti, "06.txt", "06.mp4",
                        new_size=(vo_h, vo_w), max_frames=args.max_items,
                        verbose=True, matcher=args.vo_matcher, dense=dense,
                        lightglue=(args.lg_ckpt
                                   if args.vo_matcher == "lightglue"
                                   else None),
                        device_pose=args.device_pose,
                        lg_width=args.lg_width,
                        lg_threshold=args.lg_threshold)
                    results[f"vo_{vo_h}x{vo_w}"] = r
                    print(f"VO {vo_h}x{vo_w}: {r['total']}")
                except Exception as e:
                    results[f"vo_{vo_h}x{vo_w}"] = {"error": str(e)}
        else:
            results["vo"] = {"error": "kitti_data_path missing"}

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(f"results written to {args.out}")
    if args.wandb:
        from nanovs_slam_tpu.utils.logging import MetricLogger

        logger = MetricLogger(use_wandb=True, config=vars(args))
        flat = {f"{task}/{k}": v for task, r in results.items()
                if isinstance(r, dict) for k, v in r.items()
                if isinstance(v, (int, float))}
        logger.log_dict("eval/", flat, step=0)
    return results


if __name__ == "__main__":
    main()
