#!/usr/bin/env python
"""LightGlue matcher training on KP2Dtiny descriptors (glue-factory
integration equivalent).

CLI contract mirrors the reference's glue-factory configs
(gluefactory/configs/kp2dtiny+lightglue_homography.yaml: homography pairs,
matcher n_layers 4 / dim 32, filter_threshold 0.0, NLL loss with deep
supervision): images -> random homography pair -> KP2DTiny extractor
(fixed-K keypoints + masks) -> reprojection ground-truth assignment ->
LightGlue NLL + confidence loss. Runs on any image folder, the synthetic
shapes dataset, or COCO.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--extractor_config", default="N")
    p.add_argument("--extractor_path", default=None,
                   help="KP2DTiny checkpoint (orbax dir or torch .ckpt)")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--lg_config", default="kp2dtiny_S",
                   help="LightGlue config name (matching/configs.py)")
    p.add_argument("--dataset", default="synthetic",
                   help="'synthetic' or an image folder")
    p.add_argument("--im_h", type=int, default=120)
    p.add_argument("--im_w", type=int, default=160)
    p.add_argument("--max_keypoints", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_model_path", default="lightglue_ckpt")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000,
                   help="periodic checkpoint cadence in steps (0 = only "
                        "at the end); each save fetches the params")
    return p.parse_args()


def main():
    import optax

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
    from nanovs_slam_tpu.data.homography import (homography_warp_image,
                                                 sample_homography)
    from nanovs_slam_tpu.matching.configs import LIGHTGLUE_CONFIGS
    from nanovs_slam_tpu.matching.extractor import (
        gt_matches_from_homography, make_extractor, warp_points_np)
    from nanovs_slam_tpu.matching.lightglue import (LightGlue,
                                                    assignment_at_layer,
                                                    normalize_keypoints)
    from nanovs_slam_tpu.matching.loss import (gt_weights_from_matches,
                                               matcher_metrics, nll_loss)
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.utils.checkpoint import save_checkpoint

    args = parse_args()
    H, W = args.im_h, args.im_w
    K = args.max_keypoints
    rs = np.random.RandomState(args.seed)

    # --- extractor (frozen) ---
    cfg = get_config(args.extractor_config, n_classes=args.n_classes)
    ex_model = build_model(cfg)
    params, bs = init_model(ex_model, jax.random.PRNGKey(args.seed),
                            (1, H, W, 3))
    if args.extractor_path:
        if os.path.isdir(args.extractor_path) or \
                args.extractor_path.endswith(".npz"):
            from nanovs_slam_tpu.utils.checkpoint import load_checkpoint

            tree, _ = load_checkpoint(args.extractor_path)
            params, bs = tree["params"], tree["batch_stats"]
        else:
            from nanovs_slam_tpu.utils.torch_import import \
                load_torch_checkpoint

            params, bs, _ = load_torch_checkpoint(args.extractor_path)
    ex_vars = {"params": params, "batch_stats": bs}
    extract = make_extractor(ex_model, cfg, H, W, max_keypoints=K)

    # --- matcher ---
    lg_cfg = LIGHTGLUE_CONFIGS[args.lg_config]
    if lg_cfg.input_dim != cfg.nfeatures:
        import dataclasses

        lg_cfg = dataclasses.replace(lg_cfg, input_dim=cfg.nfeatures,
                                     descriptor_dim=cfg.nfeatures)
    matcher = LightGlue(lg_cfg)

    # --- data ---
    if args.dataset == "synthetic":
        dataset = SyntheticShapesDataset((H, W), 256, 8, seed=args.seed)
        get_image = lambda i: dataset[i % len(dataset)]["image"]
    else:
        import glob

        import cv2

        files = sorted(glob.glob(os.path.join(args.dataset, "*")))
        assert files, f"no images in {args.dataset}"

        def get_image(i):
            img = cv2.cvtColor(cv2.imread(files[i % len(files)]),
                               cv2.COLOR_BGR2RGB)
            return cv2.resize(img, (W, H)).astype(np.float32) / 255.0

    warp = jax.jit(lambda im, h: homography_warp_image(im, h,
                                                       mode="bilinear"))

    def make_batch(step):
        imgs, homos = [], []
        for b in range(args.batch_size):
            imgs.append(get_image(step * args.batch_size + b))
            homos.append(sample_homography((H, W), rs))
        imgs = jnp.asarray(np.stack(imgs), jnp.float32)
        homos_n = np.stack(homos).astype(np.float32)
        warped = warp(imgs, jnp.asarray(homos_n))

        e0 = extract(ex_vars, imgs * 2 - 1)
        e1 = extract(ex_vars, warped * 2 - 1)

        # normalized-coords homography -> pixel-coords homography
        S = np.array([[ (W - 1) / 2, 0, (W - 1) / 2],
                      [0, (H - 1) / 2, (H - 1) / 2],
                      [0, 0, 1]], np.float64)
        gt_a, gt_m0, gt_m1 = [], [], []
        kp0 = np.asarray(e0["keypoints"])
        kp1 = np.asarray(e1["keypoints"])
        m0 = np.asarray(e0["mask"])
        m1 = np.asarray(e1["mask"])
        for b in range(args.batch_size):
            # image_aug[p] = image[Hn @ p] => points map aug->orig via Hn;
            # we need orig->aug: the inverse, in pixel coords.
            Hn = homos_n[b].astype(np.float64)
            H_pix = S @ np.linalg.inv(Hn) @ np.linalg.inv(S)
            a, g0, g1 = gt_matches_from_homography(
                kp0[b], kp1[b], H_pix, m0[b], m1[b], th=3.0)
            gt_a.append(a)
            gt_m0.append(g0)
            gt_m1.append(g1)

        data = {
            "keypoints0": normalize_keypoints(e0["keypoints"], (W, H)),
            "keypoints1": normalize_keypoints(e1["keypoints"], (W, H)),
            "descriptors0": e0["descriptors"],
            "descriptors1": e1["descriptors"],
            "mask0": e0["mask"], "mask1": e1["mask"],
        }
        gt = {"gt_assignment": jnp.asarray(np.stack(gt_a)),
              "gt_matches0": jnp.asarray(np.stack(gt_m0)),
              "gt_matches1": jnp.asarray(np.stack(gt_m1))}
        return data, gt

    data0, _ = make_batch(0)
    lg_params = matcher.init(jax.random.PRNGKey(args.seed), data0,
                             True)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(lg_params)

    @jax.jit
    def train_step(lg_params, opt_state, data, gt):
        def loss_fn(p):
            pred = matcher.apply({"params": p}, data, True)
            weights = gt_weights_from_matches(
                pred["log_assignment"].shape, gt["gt_assignment"],
                gt["gt_matches0"], gt["gt_matches1"])
            total = jnp.zeros(())
            n_layers = pred["all_log_assignments"].shape[1]
            for i in range(n_layers):  # gamma=1.0 uniform deep supervision
                nll, _ = nll_loss(pred["all_log_assignments"][:, i],
                                  weights)
                total = total + nll.mean()
            return total / n_layers, pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            lg_params)
        updates, opt_state = tx.update(grads, opt_state, lg_params)
        return optax.apply_updates(lg_params, updates), opt_state, loss, pred

    for step in range(args.n_steps):
        data, gt = make_batch(step)
        lg_params, opt_state, loss, pred = train_step(lg_params, opt_state,
                                                      data, gt)
        if step % args.log_every == 0:
            m = matcher_metrics(pred["matches0"], gt["gt_matches0"],
                                pred["matching_scores0"])
            print(f"step {step}: nll {float(loss):.4f} "
                  f"recall {float(m['match_recall'].mean()):.3f} "
                  f"precision {float(m['match_precision'].mean()):.3f}",
                  flush=True)
        if args.save_every and step and step % args.save_every == 0:
            # periodic overwrite: a tunnel hang mid-run (observed) must
            # not cost the whole run
            save_checkpoint(args.out_model_path, {"params": lg_params},
                            config=vars(args))

    save_checkpoint(args.out_model_path, {"params": lg_params},
                    config=vars(args))
    print(f"saved LightGlue to {args.out_model_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
