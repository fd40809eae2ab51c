#!/usr/bin/env python
"""Multitask training driver (TPU-native).

CLI contract mirrors the reference train_multitask.py (flag names,
dataset configs, loss-weight schedules, optimizer/scheduler options,
checkpoint layout) while the training step itself is ONE jitted XLA
program over a data-parallel jax.sharding.Mesh.

Reference surface: train_multitask.py:216-290 (argparse), :191-213
(dataset train configs), :52-173 (loss-weight schedules), :371-396
(optimizers/schedulers), :510-525 (train loop), :553-562 (checkpoints).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

COCOSTUFF_CONFIG = dict(lr=0.0005, n_classes=28, im_h=120, im_w=160,
                        n_epochs=20, optimizer="adam", lr_scheduler="cosine",
                        freeze_backbone=False)
CITYSCAPES_CONFIG = dict(lr=0.001, n_classes=19, im_h=120, im_w=160,
                         n_epochs=20, optimizer="adam", lr_scheduler="cosine",
                         freeze_backbone=True)
SYNTHETIC_CONFIG = dict(lr=0.0005, n_classes=8, im_h=96, im_w=128,
                        n_epochs=2, optimizer="adam", lr_scheduler="cosine",
                        freeze_backbone=False)


def parse_args():
    p = argparse.ArgumentParser(description="Train KP2DTiny multitask")
    p.add_argument("--config", default="S", help="model config name")
    p.add_argument("--model_type", default="KP2DtinyV2",
                   choices=["KP2DtinyV2", "KP2DtinyV3", "DD", "DF",
                            "KeypointFormer"])
    p.add_argument("--dataset_name", default="cocostuff",
                   choices=["cocostuff", "cityscapes", "synthetic"])
    p.add_argument("--dataset_config", default="datasets.json")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    # multi-host (TPU pod) bring-up; leave unset for single-host runs
    p.add_argument("--coordinator_address", default=None,
                   help="jax.distributed coordinator ip:port (pods only)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--n_epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=42069)
    p.add_argument("--model_path", default=None, help="checkpoint to resume")
    p.add_argument("--out_model_path", default="model_ckpt")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--depth", action="store_true")
    p.add_argument("--to_mcu", action="store_true")
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--ignore_seg_head", action="store_true",
                   help="drop final seg conv on restore (class change)")
    p.add_argument("--only_segmentation", action="store_true")
    p.add_argument("--only_keypoints", action="store_true")
    p.add_argument("--no_vpr", action="store_true")
    p.add_argument("--loss_schedule", default="default",
                   choices=["default", "refined", "D", "none"])
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (recommended on TPU)")
    p.add_argument("--qat", action="store_true",
                   help="int8 fake-quant QAT (straight-through estimator)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--watch_gradients", action="store_true",
                   help="log per-module gradient norms (wandb.watch analog, "
                        "reference train_multitask.py:629)")
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--max_eval_items", type=int, default=16,
                   help="val items per task per epoch eval")
    p.add_argument("--synthetic_items", type=int, default=64,
                   help="synthetic train set size (synthetic dataset only)")
    p.add_argument("--log_every", type=int, default=None,
                   help="loss-fetch cadence in steps (default: 10x/epoch; "
                        "each fetch syncs the dispatch pipeline)")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the train set to HBM once and assemble "
                        "batches on device (140x faster stepping on a "
                        "tunneled TPU; single-device, skips blur/equalize)")
    p.add_argument("--scan_epoch", action="store_true",
                   help="run each epoch as ONE XLA program (lax.scan over "
                        "the train step, batch assembly in-graph; requires "
                        "--device_cache). Bitwise-equal to the loop path; "
                        "removes every per-step dispatch round trip")
    p.add_argument("--ckpt_every", type=int, default=None,
                   help="checkpoint cadence in epochs (default: every "
                        "eval epoch, or n_epochs/15 under --no_eval; "
                        "each save fetches the full train state)")
    p.add_argument("--full_eval", type=int, default=3,
                   help="full keypoint/VPR/VO evaluation every n epochs "
                        "(reference train_multitask.py:275)")
    p.add_argument("--lr_scheduler", default=None,
                   choices=["none", "step", "cosine", "plateau"],
                   help="override the dataset config's LR scheduler")
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="save per-eval-epoch prediction visualizations "
                        "(training-pair keypoint overlays, seg panels) to "
                        "<out_model_path>_media/ — the headless analog of "
                        "the reference trainer's cv2.imshow debug "
                        "(KeypointNetwithIOLoss.py:607-779)")
    return p.parse_args()


def get_dataset(args, train_config, size):
    from nanovs_slam_tpu.data.datasets import (COCOStuffDataset,
                                               CityscapesDataset,
                                               SyntheticShapesDataset,
                                               load_datasets_json)

    paths = load_datasets_json(args.dataset_config)
    n_classes = train_config["n_classes"]
    if args.dataset_name == "cocostuff":
        root = paths.get("coco_data_path")
        if root and os.path.isdir(root):
            return (COCOStuffDataset(root, size, "train", n_classes,
                                     args.depth),
                    COCOStuffDataset(root, size, "val", n_classes,
                                     args.depth))
        print("WARNING: coco_data_path missing; falling back to synthetic")
    if args.dataset_name == "cityscapes":
        root = paths.get("cityscapes_data_path")
        if root and os.path.isdir(root):
            return (CityscapesDataset(root, size, "train"),
                    CityscapesDataset(root, size, "val"))
        print("WARNING: cityscapes_data_path missing; using synthetic")
    return (SyntheticShapesDataset(size, args.synthetic_items, n_classes,
                                   seed=0, with_depth=args.depth),
            SyntheticShapesDataset(size, 16, n_classes, seed=1,
                                   with_depth=args.depth))


def main():
    args = parse_args()
    # Multi-host bring-up MUST precede every other JAX API call: once the
    # local backend initializes (first PRNGKey / device query), a later
    # jax.distributed.initialize() either raises or leaves jax.devices()
    # host-local. No-op for single-process runs.
    from nanovs_slam_tpu.parallel.distributed import initialize
    initialize(coordinator_address=args.coordinator_address,
               num_processes=args.num_processes,
               process_id=args.process_id)
    train_config = {"cocostuff": COCOSTUFF_CONFIG,
                    "cityscapes": CITYSCAPES_CONFIG,
                    "synthetic": SYNTHETIC_CONFIG}[args.dataset_name].copy()
    if args.lr is not None:
        train_config["lr"] = args.lr
    if args.n_epochs is not None:
        train_config["n_epochs"] = args.n_epochs
    if args.lr_scheduler is not None:
        train_config["lr_scheduler"] = args.lr_scheduler
    if args.freeze_backbone:
        train_config["freeze_backbone"] = True
    size = (train_config["im_h"], train_config["im_w"])
    H, W = size

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.pipeline import PairLoader
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from nanovs_slam_tpu.train.schedules import (DEFAULT_LOSS_WEIGHTS,
                                                 loss_weights_for_epoch,
                                                 make_lr_schedule)
    from nanovs_slam_tpu.train.train_step import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step)
    from nanovs_slam_tpu.utils.checkpoint import (filter_params,
                                                  load_checkpoint,
                                                  merge_params,
                                                  save_checkpoint)
    from nanovs_slam_tpu.utils.logging import MetricLogger

    if args.model_type == "KeypointFormer":
        import dataclasses

        from nanovs_slam_tpu.models.keypoint_former import (
            KEYPOINTFORMER_CONFIGS, KeypointFormer)

        kf_name = args.config if args.config in KEYPOINTFORMER_CONFIGS \
            else "tiny"
        cfg = dataclasses.replace(
            KEYPOINTFORMER_CONFIGS[kf_name],
            n_classes=train_config["n_classes"],
            dtype="bfloat16" if args.bf16 else "float32")
        model = KeypointFormer(cfg)
    else:
        v3 = args.model_type in ("KP2DtinyV3", "DF")
        cfg = get_config(args.config, v3=v3,
                         n_classes=train_config["n_classes"],
                         to_mcu=args.to_mcu, depth=args.depth,
                         dtype="bfloat16" if args.bf16 else "float32")
        model = build_model(cfg)

    train_flags = {"keypoints": True, "segmentation": True, "visloc": True,
                   "depth": args.depth}
    if args.only_segmentation:
        train_flags.update(keypoints=False, visloc=False, depth=False)
    elif args.only_keypoints:
        train_flags.update(segmentation=False, visloc=False, depth=False)
    if args.no_vpr:
        train_flags["visloc"] = False
    if args.dataset_name == "cityscapes":
        train_flags["depth"] = False

    dataset, dataset_val = get_dataset(args, train_config, size)
    d_f = cfg.cell // 2
    # Multi-host input pipeline: each process loads ONLY its shard of the
    # global batch; host_local_batch_to_global assembles the global
    # jax.Array per step with zero cross-host data movement.
    from nanovs_slam_tpu.parallel.distributed import (
        host_local_batch_to_global, process_local_batch_size)
    multihost = jax.process_count() > 1
    local_bs = process_local_batch_size(args.batch_size)
    if args.device_cache:
        from nanovs_slam_tpu.data.device_cache import DeviceCachedPairLoader

        if multihost:
            raise SystemExit("--device_cache assembles batches on the local "
                             "device set and is single-process only; drop it "
                             "for multi-host runs")
        loader = DeviceCachedPairLoader(dataset, local_bs, H, W,
                                        d_f=d_f, train=True, seed=args.seed,
                                        with_depth=args.depth)
        print(f"device cache: {loader.n} items, "
              f"{loader.nbytes() / 1e6:.1f} MB resident in HBM")
    else:
        # per-host data seed so processes draw disjoint augmentations
        loader = PairLoader(dataset, local_bs, H, W, d_f=d_f,
                            train=True,
                            seed=args.seed + 1000 * jax.process_index(),
                            with_depth=args.depth)
    steps_per_epoch = len(loader)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)

    plateau_ctl = None
    if train_config["lr_scheduler"] == "plateau":
        from nanovs_slam_tpu.train.schedules import PlateauController

        plateau_ctl = PlateauController(train_config["lr"], mode="max",
                                        factor=0.1, patience=5)
        tx = make_optimizer(train_config["optimizer"], lr=train_config["lr"],
                            freeze_backbone=train_config["freeze_backbone"],
                            plateau=True)
    else:
        lr_sched = make_lr_schedule(train_config["lr_scheduler"],
                                    train_config["lr"], steps_per_epoch,
                                    train_config["n_epochs"])
        tx = make_optimizer(train_config["optimizer"], schedule=lr_sched,
                            freeze_backbone=train_config["freeze_backbone"])
    rng = jax.random.PRNGKey(args.seed)
    state, io_net = create_train_state(model, cfg, rng, (1, H, W, 3), tx,
                                       with_io=train_flags["keypoints"],
                                       io_top_k=args.top_k)

    if args.model_path:
        tree, meta = load_checkpoint(args.model_path)
        mode = "seg_last" if args.ignore_seg_head else None
        restored = filter_params(tree["params"], mode)
        state = state.replace(
            params=merge_params(state.params, restored),
            batch_stats=merge_params(state.batch_stats,
                                     tree.get("batch_stats", {})))
        print(f"Restored model from {args.model_path} "
              f"(epoch {meta.get('epoch')})")

    n_dev = args.num_devices or jax.device_count()
    mesh = make_mesh(n_dev)
    state = replicate(mesh, state)
    step_fn = make_train_step(model, cfg, H, W, io_net=io_net,
                              train_flags=train_flags, io_top_k=args.top_k,
                              qat=args.qat,
                              watch_gradients=args.watch_gradients)
    epoch_fn = None
    if args.scan_epoch:
        if not args.device_cache:
            raise SystemExit("--scan_epoch assembles batches from the HBM "
                             "dataset cache; it requires --device_cache")
        from nanovs_slam_tpu.train.scan_epoch import (make_epoch_fn,
                                                      shard_epoch_inputs,
                                                      weights_as_arrays)
        step_body = make_train_step(model, cfg, H, W, io_net=io_net,
                                    train_flags=train_flags,
                                    io_top_k=args.top_k, qat=args.qat,
                                    watch_gradients=args.watch_gradients,
                                    jit_compile=False)
        epoch_fn = make_epoch_fn(step_body, d_f=d_f,
                                 with_depth=args.depth, augment=True)

    config_blob = {"input_args": vars(args), "train_config": train_config,
                   "size": size, "model_config": getattr(cfg, "name", args.config),
                   "variant": getattr(cfg, "variant", args.model_type),
                   "loss_weights_schedule":
                   args.loss_schedule}
    logger = MetricLogger(use_wandb=args.wandb, config=config_blob)

    results = {}
    losses = []
    log_every = args.log_every or max(1, steps_per_epoch // 10)
    t_start = time.time()
    for epoch in range(args.start_epoch, train_config["n_epochs"]):
        weights = loss_weights_for_epoch(epoch, args.loss_schedule,
                                         DEFAULT_LOSS_WEIGHTS)
        if args.no_vpr:
            weights = weights._replace(vlad_loss=0.0)
        epoch_rng = jax.random.fold_in(rng, epoch)
        losses = []
        if epoch_fn is not None:
            # one dispatch for the whole epoch; the host uploads only the
            # epoch's indices + homographies and (on log epochs) fetches
            # the stacked per-step metrics once
            idx_all, homos_all, assemble_rng = loader.epoch_arrays(epoch)
            idx_all = idx_all[:steps_per_epoch]
            homos_all = homos_all[:steps_per_epoch]
            cache = loader.cache_arrays()
            if n_dev > 1:
                # dp over the mesh, still one dispatch/epoch: cache+state
                # replicated, the batch dim of indices/homographies
                # sharded (no-op placement on later epochs)
                state, cache, idx_all, homos_all = shard_epoch_inputs(
                    mesh, state, cache, idx_all, homos_all)
            state, metrics_stack = epoch_fn(
                state, cache, idx_all, homos_all,
                weights_as_arrays(weights), assemble_rng, epoch_rng)
            if (epoch * steps_per_epoch) % log_every < steps_per_epoch:
                # ONE transfer for all metrics (per-key float() costs a
                # ~30 ms tunnel RTT each)
                m = {k: float(v) for k, v in jax.device_get(
                    {k: v[-1] for k, v in metrics_stack.items()}).items()}
                losses.append(m["total_loss"])
                logger.log_dict("loss/", m,
                                step=(epoch + 1) * steps_per_epoch - 1)
                print(f"E{epoch} it{steps_per_epoch - 1}/{steps_per_epoch} "
                      f"loss {m['total_loss']:.4f} "
                      f"seg {m.get('seg_loss', 0):.4f} "
                      f"vlad {m.get('vlad_loss', 0):.4f}", flush=True)
        elif args.device_cache:
            # batches are assembled on device; nothing to prefetch/shard
            batch_iter = iter(loader.epoch(epoch))
        else:
            from nanovs_slam_tpu.data.prefetch import device_prefetch

            # 2-deep prefetch: host-side augmentation + homography sampling
            # for batch t+1 overlaps the device step for batch t
            batch_iter = device_prefetch(iter(loader), size=2)
        for i, batch in enumerate(() if epoch_fn is not None else batch_iter):
            if i >= steps_per_epoch:
                break
            if not args.device_cache:
                batch = (host_local_batch_to_global(mesh, batch)
                         if multihost else shard_batch(mesh, batch))
            state, metrics = step_fn(state, batch, weights,
                                     jax.random.fold_in(epoch_rng, i))
            # fetching a metric synchronizes the async dispatch pipeline —
            # on a remote/tunneled TPU that round trip dominates if done
            # every few steps, so the cadence is configurable
            if (epoch * steps_per_epoch + i) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                losses.append(m["total_loss"])
                logger.log_dict("loss/", m, step=epoch * steps_per_epoch + i)
                print(f"E{epoch} it{i}/{steps_per_epoch} "
                      f"loss {m['total_loss']:.4f} "
                      f"seg {m.get('seg_loss', 0):.4f} "
                      f"vlad {m.get('vlad_loss', 0):.4f}", flush=True)

        if not args.no_eval and (epoch + 1) % args.eval_every == 0:
            results = evaluate_model(model, cfg, state, dataset_val, size,
                                     args, train_flags, epoch)
            flat = {f"{task}/{k}": v for task, r in results.items()
                    if isinstance(r, dict) for k, v in r.items()
                    if isinstance(v, (int, float))}
            logger.log_dict("val/", flat, step=int(state.step))
            print(f"E{epoch} val: {json.dumps(results, default=str)}")

        if plateau_ctl is not None:
            from nanovs_slam_tpu.train.train_step import (get_learning_rate,
                                                          set_learning_rate)

            import math

            metric = plateau_metric(results, losses)
            new_lr = plateau_ctl.step(metric)
            if not math.isclose(new_lr, get_learning_rate(state),
                                rel_tol=1e-5):
                print(f"E{epoch} plateau: metric {metric:.4f} stalled, "
                      f"lr -> {new_lr:.2e}")
                state = set_learning_rate(state, new_lr)
            logger.log_dict("scheduler/", {"lr": new_lr},
                            step=int(state.step))

        # checkpoint at eval epochs and at the end. NOT every epoch: a
        # save fetches the full state (params + opt_state, ~11 MB for S)
        # over the tunnel — measured ~15 s/epoch vs ~0.5 s of actual
        # compute when a --no_eval run saved per-epoch. --ckpt_every
        # bounds the loss-on-crash window for long runs.
        ckpt_every = args.ckpt_every or (
            args.eval_every if not args.no_eval
            else max(1, train_config["n_epochs"] // 15))
        if ((epoch + 1) % ckpt_every == 0
                or epoch + 1 == train_config["n_epochs"]):
            save_checkpoint(args.out_model_path, state,
                            config=config_blob, epoch=epoch + 1,
                            results=results)
    if losses:
        print(f"done in {time.time() - t_start:.1f}s; "
              f"final loss {losses[-1]:.4f}")
    else:
        print(f"done in {time.time() - t_start:.1f}s "
              f"(no loss fetch in the final epoch; see metrics.jsonl)")


def plateau_metric(results, losses) -> float:
    """Quality metric for the plateau controller (mode=max): val seg IoU,
    else keypoint repeatability, else -mean train loss."""
    seg = results.get("segmentation", {}) if results else {}
    if isinstance(seg, dict) and isinstance(seg.get("IoU"), (int, float)):
        return float(seg["IoU"])
    kp = results.get("keypoints", {}) if results else {}
    if isinstance(kp, dict) and isinstance(kp.get("repeatability"),
                                           (int, float)):
        return float(kp["repeatability"])
    return -float(np.mean(losses)) if losses else float("nan")


def evaluate_model(model, cfg, state, dataset_val, size, args, train_flags,
                   epoch):
    """Per-epoch evaluation fan-out (reference evaluate_model,
    train_multitask.py:701-751): segmentation (+depth) every eval epoch;
    keypoints / VPR / VO every --full_eval epochs. Each task is guarded
    (reference-style try/except) and falls back to synthetic
    homography-pair data when the real dataset is absent; results land in
    the checkpoint like the reference's `current_results` (:553-562)."""
    import cv2
    import jax.numpy as jnp

    from nanovs_slam_tpu.data.datasets import load_datasets_json
    from nanovs_slam_tpu.inference import make_infer_fn

    H, W = size
    infer = make_infer_fn(model, cfg, H, W)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def infer_np(images):
        out = infer(variables, jnp.asarray(images, jnp.float32))
        return {k: np.asarray(v) for k, v in out.items()}

    n_val = min(len(dataset_val), args.max_eval_items)
    results = {}

    if train_flags.get("segmentation"):
        from nanovs_slam_tpu.evaluation.segmentation import \
            evaluate_segmentation

        def seg_iter():
            hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
            for i in range(n_val):
                item = dataset_val[i]
                seg = cv2.resize(item["seg"], (ws, hs),
                                 interpolation=cv2.INTER_NEAREST)
                yield {"image": item["image"][None] * 2 - 1,
                       "seg": seg[None]}

        try:
            results["segmentation"] = evaluate_segmentation(
                seg_iter(), infer_np, cfg.n_classes)
        except Exception as e:
            results["segmentation"] = {"error": str(e)}

    if train_flags.get("depth"):
        from nanovs_slam_tpu.evaluation.depth import evaluate_depth

        def depth_iter():
            # GT depth downsampled (NEAREST) to the depth head's resolution
            # H/d_f, like the reference transform_post_seg (nyuv2.py:30-36)
            hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
            for i in range(n_val):
                item = dataset_val[i]
                if "depth" in item:
                    d = cv2.resize(item["depth"], (ws, hs),
                                   interpolation=cv2.INTER_NEAREST)
                    yield {"image": item["image"][None] * 2 - 1,
                           "depth": d[None, ..., None]}

        try:
            results["depth"] = evaluate_depth(depth_iter(), infer_np)
            # file-sink analog of the reference's wandb depth-image logging
            # (log_depth_examples, train_multitask.py:754-769); sibling dir
            # because orbax replaces the checkpoint directory on save
            save_depth_examples(dataset_val, infer_np,
                                os.path.join(args.out_model_path + "_media",
                                             f"depth_examples_e{epoch}.png"))
        except Exception as e:
            results["depth"] = {"error": str(e)}

    if getattr(args, "debug", False):
        try:
            from nanovs_slam_tpu.evaluation.detector import warp_keypoints
            from nanovs_slam_tpu.utils.debug_viz import (save_pair_debug,
                                                         save_seg_debug)

            media = args.out_model_path + "_media"
            item = synthetic_homography_pairs(dataset_val, size, 1)[0]
            out0 = infer_np(item["image"])
            out1 = infer_np(item["image_aug"])
            kps0 = out0["coord"].reshape(-1, 2)
            save_pair_debug(
                os.path.join(media, f"debug_pair_e{epoch}.png"),
                item["image"], item["image_aug"], kps0,
                out1["coord"].reshape(-1, 2),
                kps0_warped=warp_keypoints(kps0, item["homography"]),
                scores0=out0["score"].reshape(-1),
                scores1=out1["score"].reshape(-1), top_k=args.top_k)
            if train_flags.get("segmentation"):
                val0 = dataset_val[0]
                hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
                gt = cv2.resize(val0["seg"], (ws, hs),
                                interpolation=cv2.INTER_NEAREST)
                pred = infer_np(val0["image"][None] * 2 - 1)["seg"][0]
                save_seg_debug(
                    os.path.join(media, f"debug_seg_e{epoch}.png"),
                    val0["image"], pred, gt, n_classes=cfg.n_classes)
        except Exception as e:
            print(f"debug visualization failed: {e}")

    if (epoch + 1) % args.full_eval != 0:
        return results

    # --- full eval: keypoints (HPatches-format), VPR, VO ---
    paths = load_datasets_json(args.dataset_config)

    if train_flags.get("keypoints"):
        from nanovs_slam_tpu.evaluation.keypoints import evaluate_keypoint_net

        try:
            root = paths.get("hpatches_data_path")
            if root and os.path.isdir(root):
                from nanovs_slam_tpu.data.hpatches import HPatchesDataset

                items = list(HPatchesDataset(root, (W, H)))[:n_val]
            else:
                items = synthetic_homography_pairs(dataset_val, size, n_val)
            r = evaluate_keypoint_net(items, infer_np, output_shape=(W, H),
                                      top_k=args.top_k)
            if r["repeatability"] == -1:
                # score head not yet calibrated to the reference's 0.7
                # operating point: fall back to pure top-k ranking so the
                # training trend stays visible (threshold recorded)
                r = evaluate_keypoint_net(items, infer_np,
                                          output_shape=(W, H),
                                          top_k=args.top_k,
                                          conf_threshold=0.0)
                r["conf_threshold_used"] = 0.0
            results["keypoints"] = r
        except Exception as e:
            results["keypoints"] = {"error": str(e)}

    if train_flags.get("visloc"):
        from nanovs_slam_tpu.evaluation.global_descriptor import \
            evaluate_global_descriptor

        try:
            # DB = val images, queries = homography-warped copies,
            # ground-truth positive of query i is db entry i (synthetic
            # Pittsburgh-format retrieval when the real set is absent)
            items = synthetic_homography_pairs(dataset_val, size, n_val)
            db = np.stack([infer_np(it["image"])["vlad"][0]
                           for it in items])
            q = np.stack([infer_np(it["image_aug"])["vlad"][0]
                          for it in items])
            positives = [np.array([i]) for i in range(len(items))]
            n_values = tuple(n for n in (1, 5, 10, 20)
                             if n <= len(items)) or (1,)
            results["visloc"] = evaluate_global_descriptor(
                db, q, positives, n_values=n_values)
        except Exception as e:
            results["visloc"] = {"error": str(e)}

    if train_flags.get("keypoints"):
        kitti = paths.get("kitti_data_path")
        if not (kitti and os.path.isdir(kitti)):
            # synthetic-KITTI fallback (same policy as the keypoint eval's
            # synthetic HPatches fixture): a seeded exact-shift sequence
            # so the VO fan-out always produces numbers
            try:
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from make_synthetic_kitti import make_sequence

                # repo-anchored, not CWD-relative (ADVICE r3)
                kitti = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "kitti_synth")
                if not os.path.exists(os.path.join(kitti, "06.txt")):
                    make_sequence(kitti, 12)
            except Exception as e:
                results["vo"] = {"skipped": f"no kitti, fixture gen: {e}"}
                kitti = None
        if kitti:
            from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
            from nanovs_slam_tpu.vo.visual_odometry import \
                evaluate_visual_odometry

            try:
                fe = KP2DTinyFrontend(model, cfg, variables, (256, 1024),
                                      top_k=4000)
                results["vo"] = evaluate_visual_odometry(
                    fe, kitti, "06.txt", "06.mp4", new_size=(256, 1024),
                    max_frames=n_val)
            except Exception as e:
                results["vo"] = {"error": str(e)}
    return results


def save_depth_examples(dataset_val, infer_np, path, n: int = 4):
    """Grid of (input | predicted depth | GT depth) rows for the first n
    val items (wandb.Image analog; reference train_multitask.py:754-769)."""
    import cv2

    rows = []
    for i in range(min(n, len(dataset_val))):
        item = dataset_val[i]
        if "depth" not in item:
            return
        out = infer_np(item["image"][None] * 2.0 - 1.0)
        pred = np.asarray(out["depth"])[0, ..., 0]
        gt = item["depth"][..., 0]
        H, W = item["image"].shape[:2]

        def colorize(d):
            d = (255 * (d - d.min()) / max(float(d.max() - d.min()), 1e-6))
            d8 = cv2.resize(d.astype(np.uint8), (W, H),
                            interpolation=cv2.INTER_NEAREST)
            return cv2.applyColorMap(d8, cv2.COLORMAP_MAGMA)

        img_u8 = cv2.cvtColor((item["image"] * 255).astype(np.uint8),
                              cv2.COLOR_RGB2BGR)
        rows.append(np.concatenate([img_u8, colorize(pred), colorize(gt)],
                                   axis=1))
    if rows:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cv2.imwrite(path, np.concatenate(rows, axis=0))


def synthetic_homography_pairs(dataset, size, n_items):
    """HPatches-format eval pairs from any image dataset: sample a random
    homography per image, warp ON DEVICE with the training warper, and
    return the PIXEL point-transfer matrix the evaluators expect."""
    import jax.numpy as jnp

    from nanovs_slam_tpu.data.homography import (homography_to_pixel,
                                                 homography_warp_image,
                                                 sample_homography)

    H, W = size
    items = []
    for i in range(min(len(dataset), n_items)):
        img = dataset[i]["image"]
        rs = np.random.RandomState(1000 + i)
        H_norm = sample_homography((H, W), rs)
        warped = homography_warp_image(
            jnp.asarray(img[None]), jnp.asarray(H_norm[None]),
            mode="bilinear")
        items.append({
            "image": img[None] * 2.0 - 1.0,
            "image_aug": np.asarray(warped) * 2.0 - 1.0,
            "homography": homography_to_pixel(H_norm, (H, W)),
        })
    return items


if __name__ == "__main__":
    main()
