#!/usr/bin/env python
"""Matcher benchmark: trained LightGlue vs BF ratio-test on HELD-OUT
homography pairs (VERDICT r2 "Next round" #4 — "a LightGlue that earns
its keep").

Protocol: sample pairs the matcher trainer never saw (different RNG
stream + optionally the discriminative HPatches fixture textures),
extract fixed-K keypoints/descriptors with the SAME frozen extractor,
compute reprojection ground truth (mutual-NN within 3 px), then match
with (a) the BF ratio-test one-to-one matcher the VO pipeline defaults
to and (b) the trained LightGlue, and report precision / recall / F1 of
predicted correspondences vs GT (a predicted pair is correct when the
warped kp0 lands within 3 px of kp1).

Usage:
  python tools/matcher_benchmark.py --lg-ckpt lightglue_ckpt \
      [--extractor-ckpt model_ckpt/r3_long] [--pairs 64] [--dense]
Writes artifacts/matcher_benchmark.json.

--dense additionally scores the detector-free DenseMatcher (the native
LoFTR-mode analog) on the SAME pairs. Its correspondences are free
points, not detector indices, so GT differs: a dense match (p0 -> p1) is
correct when warp(p0) lands within 3 px of p1, and recall is measured
against the coarse-cell grid (how many inner cells of image0 whose
warped center stays in-bounds got a correct match) — the densest
recoverable set for a cell-grid matcher. Precision is directly
comparable with BF/LightGlue; recall is reported against its own base.
"""

import argparse
import json
import os
import sys

# CPU by default (override with JAX_PLATFORMS=tpu): precision/recall is
# backend-independent, and a dead tunnel would otherwise hang backend
# init (the axon plugin registers via sitecustomize)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def pair_pr(kp0, kp1, i0, i1, H_pix, th=3.0):
    """precision/recall of predicted index pairs vs reprojection GT."""
    from nanovs_slam_tpu.matching.extractor import warp_points_np

    if len(i0) == 0:
        return 0.0, 0.0, 0
    w = warp_points_np(kp0[i0], H_pix)
    correct = np.linalg.norm(w - kp1[i1], axis=-1) < th
    # recall base: how many kp0 HAVE a true counterpart within th
    w_all = warp_points_np(kp0, H_pix)
    d = np.linalg.norm(w_all[:, None] - kp1[None], axis=-1)
    has_gt = (d.min(axis=1) < th)
    n_gt = int(has_gt.sum())
    precision = float(correct.mean())
    recall = float(correct.sum() / max(n_gt, 1))
    return precision, recall, n_gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lg-ckpt", required=True)
    ap.add_argument("--extractor-ckpt", default=None)
    ap.add_argument("--extractor-config", default="N")
    ap.add_argument("--n-classes", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--im-h", type=int, default=120)
    ap.add_argument("--im-w", type=int, default=160)
    ap.add_argument("--max-keypoints", type=int, default=256)
    ap.add_argument("--seed", type=int, default=777)  # held-out stream
    ap.add_argument("--ratio", type=float, default=0.9)
    ap.add_argument("--lg-threshold", type=float, default=0.1)
    ap.add_argument("--lg-width", type=float, default=-1.0,
                    help="also benchmark width-pruned LightGlue at this "
                         "width_confidence (quality twin of the "
                         "bench_latency.py --width_pruning speed rows)")
    ap.add_argument("--lg-width-prunes", type=int, default=None,
                    help="bound the number of halvings (None = halve at "
                         "every early layer to the floor)")
    ap.add_argument("--lg-width-engaged", action="store_true",
                    help="use engaged_width_forward (keep-count probe "
                         "selects the schedule floor per pair — the "
                         "reference's automatic engagement) instead of "
                         "forcing the static bucket")
    ap.add_argument("--out", default=None,
                    help="output JSON path (default "
                         "artifacts/matcher_benchmark.json)")
    ap.add_argument("--dense", action="store_true",
                    help="also score the detector-free DenseMatcher")
    ap.add_argument("--dense-threshold", type=float, default=0.05)
    ap.add_argument("--dense-rel", type=float, nargs="*", default=None,
                    help="ALSO score the adaptive per-pair rule "
                         "thr = rel * max(conf) at these rel values "
                         "(the VO paths' dense_rel_conf)")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize may set jax_platforms programmatically; the env
        # var alone is not enough (same recipe as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
    from nanovs_slam_tpu.data.homography import (homography_warp_image,
                                                 sample_homography)
    from nanovs_slam_tpu.matching.configs import LIGHTGLUE_CONFIGS
    from nanovs_slam_tpu.matching.extractor import make_extractor
    from nanovs_slam_tpu.matching.lightglue import (LightGlue,
                                                    normalize_keypoints)
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
    from nanovs_slam_tpu.vo.matcher import ratio_test_match_one_to_one

    H, W, K = args.im_h, args.im_w, args.max_keypoints
    rs = np.random.RandomState(args.seed)

    cfg = get_config(args.extractor_config, n_classes=args.n_classes)
    ex_model = build_model(cfg)
    params, bs = init_model(ex_model, jax.random.PRNGKey(0), (1, H, W, 3))
    if args.extractor_ckpt:
        tree, _ = load_checkpoint(args.extractor_ckpt)
        params, bs = tree["params"], tree["batch_stats"]
    ex_vars = {"params": params, "batch_stats": bs}
    extract = make_extractor(ex_model, cfg, H, W, max_keypoints=K)

    lg_tree, lg_meta = load_checkpoint(args.lg_ckpt)
    lg_cfg = LIGHTGLUE_CONFIGS.get(
        (lg_meta or {}).get("config", {}).get("lg_config", "kp2dtiny_S"),
        LIGHTGLUE_CONFIGS["kp2dtiny_S"])
    if lg_cfg.input_dim != cfg.nfeatures:
        import dataclasses
        lg_cfg = dataclasses.replace(lg_cfg, input_dim=cfg.nfeatures,
                                     descriptor_dim=cfg.nfeatures)
    import dataclasses
    lg_cfg = dataclasses.replace(lg_cfg,
                                 filter_threshold=args.lg_threshold)
    matcher = LightGlue(lg_cfg)
    lg_params = lg_tree["params"]

    @jax.jit
    def lg_match(data):
        return matcher.apply({"params": lg_params}, data, False)

    wp_match = None
    if args.lg_width > 0:
        from nanovs_slam_tpu.matching.width_pruning import (
            engaged_width_forward, width_pruned_forward)

        if args.lg_width_engaged:
            def wp_match(data):
                return engaged_width_forward(matcher, lg_params, data,
                                             args.lg_width,
                                             n_prunes=args.lg_width_prunes)
        else:
            def wp_match(data):
                return width_pruned_forward(matcher, lg_params, data,
                                            args.lg_width,
                                            n_prunes=args.lg_width_prunes)

    dense_matcher = None
    if args.dense:
        from nanovs_slam_tpu.matching.dense import DenseMatcher
        dense_matcher = DenseMatcher(ex_model, cfg, ex_vars, (H, W),
                                     k=min(2 * K, 512))

    dataset = SyntheticShapesDataset((H, W), 128, 8, seed=args.seed)
    warp = jax.jit(lambda im, h: homography_warp_image(im, h,
                                                       mode="bilinear"))
    S = np.array([[(W - 1) / 2, 0, (W - 1) / 2],
                  [0, (H - 1) / 2, (H - 1) / 2],
                  [0, 0, 1]], np.float64)

    rows = {"bf": [], "lightglue": []}
    if wp_match is not None:
        rows["lightglue_width_pruned"] = []
    if dense_matcher is not None:
        rows["dense"] = []
        for rel in (args.dense_rel or []):
            rows[f"dense_rel{rel}"] = []
    for i in range(args.pairs):
        img = dataset[i % len(dataset)]["image"]
        Hn = sample_homography((H, W), rs).astype(np.float64)
        imgs = jnp.asarray(img[None], jnp.float32)
        warped = warp(imgs, jnp.asarray(Hn[None].astype(np.float32)))
        e0 = extract(ex_vars, imgs * 2 - 1)
        e1 = extract(ex_vars, warped * 2 - 1)
        kp0 = np.asarray(e0["keypoints"][0])
        kp1 = np.asarray(e1["keypoints"][0])
        m0 = np.asarray(e0["mask"][0]).astype(bool)
        m1 = np.asarray(e1["mask"][0]).astype(bool)
        d0 = np.asarray(e0["descriptors"][0])
        d1 = np.asarray(e1["descriptors"][0])
        H_pix = S @ np.linalg.inv(Hn) @ np.linalg.inv(S)

        # (a) BF ratio test, restricted to valid keypoints
        v0, v1 = np.where(m0)[0], np.where(m1)[0]
        i0, i1, _ = ratio_test_match_one_to_one(d0[v0], d1[v1],
                                                ratio_test=args.ratio)
        p, r, n_gt = pair_pr(kp0, kp1, v0[i0], v1[i1], H_pix)
        rows["bf"].append((p, r, len(i0), n_gt))

        # (b) LightGlue
        data = {
            "keypoints0": normalize_keypoints(e0["keypoints"], (W, H)),
            "keypoints1": normalize_keypoints(e1["keypoints"], (W, H)),
            "descriptors0": e0["descriptors"],
            "descriptors1": e1["descriptors"],
            "mask0": e0["mask"], "mask1": e1["mask"],
        }
        pred = lg_match(data)
        match0 = np.asarray(pred["matches0"][0])
        sel = np.where(match0 >= 0)[0]
        p, r, n_gt = pair_pr(kp0, kp1, sel, match0[sel], H_pix)
        rows["lightglue"].append((p, r, len(sel), n_gt))

        # (b2) width-pruned LightGlue on the identical pair
        if wp_match is not None:
            predw = wp_match(data)
            m0w = np.asarray(predw["matches0"][0])
            selw = np.where(m0w >= 0)[0]
            p, r, n_gt = pair_pr(kp0, kp1, selw, m0w[selw], H_pix)
            rows["lightglue_width_pruned"].append((p, r, len(selw), n_gt))

        # (c) detector-free dense matcher on the same image pair
        if dense_matcher is not None:
            from nanovs_slam_tpu.matching.extractor import warp_points_np

            # recall base: inner coarse cells whose warped center stays
            # in image1 bounds (the densest set a cell-grid matcher can
            # recover)
            cell = cfg.cell
            Hc2, Wc2 = H // cell, W // cell
            jj, ii = np.meshgrid(np.arange(1, Wc2 - 1),
                                 np.arange(1, Hc2 - 1))
            centers = np.stack(
                [jj.ravel() * cell + (cell - 1) / 2,
                 ii.ravel() * cell + (cell - 1) / 2], -1).astype(np.float64)
            wc_img1 = warp_points_np(centers, H_pix)
            in_b = ((wc_img1[:, 0] >= 0) & (wc_img1[:, 0] <= W - 1)
                    & (wc_img1[:, 1] >= 0) & (wc_img1[:, 1] <= H - 1))
            n_base = max(int(in_b.sum()), 1)

            def score_dense(dm_out, row_key):
                p0, p1 = dm_out["keypoints0"], dm_out["keypoints1"]
                if len(p0):
                    correct = (np.linalg.norm(
                        warp_points_np(p0, H_pix) - p1, axis=-1) < 3.0)
                    prec = float(correct.mean())
                    n_correct = int(correct.sum())
                else:
                    prec, n_correct = 0.0, 0
                rows[row_key].append((prec, n_correct / n_base, len(p0),
                                      n_base))

            score_dense(dense_matcher(np.asarray(imgs[0]),
                                      np.asarray(warped[0]),
                                      conf_threshold=args.dense_threshold),
                        "dense")
            for rel in (args.dense_rel or []):
                score_dense(dense_matcher(np.asarray(imgs[0]),
                                          np.asarray(warped[0]),
                                          rel_threshold=rel),
                            f"dense_rel{rel}")

    out = {}
    for name, rws in rows.items():
        ps, rcs, ns, gts = map(np.array, zip(*rws))
        f1 = 2 * ps * rcs / np.maximum(ps + rcs, 1e-9)
        out[name] = {"precision": float(ps.mean()),
                     "recall": float(rcs.mean()),
                     "f1": float(f1.mean()),
                     "mean_matches": float(ns.mean()),
                     "mean_gt": float(gts.mean())}
        print(name, out[name])

    out["config"] = vars(args)
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    path = args.out or os.path.join(_REPO, "artifacts",
                                    "matcher_benchmark.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
