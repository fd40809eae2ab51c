#!/usr/bin/env python
"""Pipeline-level parity harness (VERDICT r2 "Next round" #1, the
BASELINE.md bar).

Runs the REFERENCE's own eval code (/root/reference/src/evaluation/
keypoints.py:57-175 and visual_odometry.py:200-332) with the reference's
own torch models, side-by-side with THIS framework, from IDENTICAL
weights on IDENTICAL fixture data, and compares the resulting METRICS —
not just tensors.

Weights: either a checkpoint trained in this framework (--ckpt, exported
into torch via utils/torch_export) or the torch random init imported into
JAX (--random). An optional --score-bias SHIFT is added to the score-head
bias in BOTH stacks (rank-preserving sigmoid shift) so the reference's
hard 0.7 confidence gates pass on under-calibrated checkpoints.

Fixtures: the discriminative synthetic HPatches set (40 graded-warp
pairs) and the synthetic KITTI video (gray texture — the reference VO
feeds cv2-BGR frames to the net while we feed RGB; gray makes both
identical).

Determinism: cv2.setRNGSeed before each stack's eval pins the RANSAC
draws (findHomography / USAC_MSAC findEssentialMat).

Usage:
  python tools/pipeline_parity.py --task keypoints [--ckpt CKPT] [--top-k 300]
  python tools/pipeline_parity.py --task vo [--ckpt CKPT] [--frames 30]
Writes artifacts/pipeline_parity_<task>.json.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")  # use TPU if available for ours

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

import ref_shims  # noqa: E402

N_CLASSES = 8
CONFIG = "N"
EVAL_W, EVAL_H = 320, 240  # reference eval_multitask default output_shape


def build_weight_pair(ckpt=None, score_bias=0.0, seed=0):
    """Returns (tmodel, cfg, variables) with identical weights.

    The model config comes from the checkpoint's own metadata when --ckpt
    is given (e.g. model_ckpt/r3_long is config "S"), falling back to
    CONFIG for --random runs.
    """
    ref_shims.install()
    import torch

    from kp2dtiny.models.kp2dtiny import KP2DTinyV2

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model  # noqa: F401
    from nanovs_slam_tpu.utils.torch_export import load_into_torch_model
    from nanovs_slam_tpu.utils.torch_import import convert_state_dict

    config_name, n_classes = CONFIG, N_CLASSES
    if ckpt:
        from nanovs_slam_tpu.utils.checkpoint import load_checkpoint
        _, meta = load_checkpoint(ckpt)
        mc = meta.get("config", {}) if isinstance(meta, dict) else {}
        config_name = mc.get("model_config", CONFIG)
        n_classes = mc.get("train_config", {}).get("n_classes", N_CLASSES)
        print(f"checkpoint config: {config_name} n_classes={n_classes}")

    cfg = get_config(config_name, v3=False, n_classes=n_classes)
    torch.manual_seed(seed)
    kw = dict(nClasses=n_classes, nfeatures=cfg.nfeatures,
              channel_dims=list(cfg.channel_dims),
              downsample=cfg.downsample, use_attention=cfg.use_attention,
              leaky_relu=cfg.leaky_relu, num_clusters=cfg.num_clusters,
              encoder_dim=cfg.encoder_dim,
              global_descriptor_method=cfg.global_descriptor_method,
              upscale_method=cfg.upscale_method, depth=False)
    tmodel = KP2DTinyV2(**kw).eval()

    if ckpt:
        from nanovs_slam_tpu.utils.checkpoint import load_checkpoint

        tree, meta = load_checkpoint(ckpt)
        params, batch_stats = tree["params"], tree.get("batch_stats", {})
        load_into_torch_model(tmodel, params, batch_stats)
        print(f"loaded {ckpt} into BOTH stacks (epoch {meta.get('epoch')})")
    else:
        params, batch_stats = convert_state_dict(tmodel.state_dict())
        print("using torch random init in BOTH stacks")

    if score_bias:
        import jax

        def shift(tree):
            # score head final conv bias: score_head/out/bias in ours
            def f(path, x):
                keys = "/".join(str(p) for p in path)
                if "score" in keys and keys.endswith("bias") and x.ndim == 1 \
                        and x.shape[0] == 1:
                    print(f"  score-bias +{score_bias}: {keys}")
                    return x + score_bias
                return x
            return jax.tree_util.tree_map_with_path(
                lambda p, x: f([getattr(q, 'key', q) for q in p], x), tree)

        params = shift(params)
        with_t = [k for k in tmodel.state_dict() if "score" in k
                  and k.endswith("bias")]
        sd = tmodel.state_dict()
        import torch as _t
        for k in with_t:
            if sd[k].numel() == 1:
                sd[k] = sd[k] + score_bias
                print(f"  score-bias +{score_bias}: torch {k}")
        tmodel.load_state_dict(sd)

    variables = {"params": params, "batch_stats": batch_stats}
    return tmodel, cfg, variables


# ---------------------------------------------------------------- keypoints

def ref_keypoint_eval(tmodel, items, top_k, cv2_seed=0):
    import cv2
    import torch

    ref_kp, _ = ref_shims.import_ref_eval()

    def loader():
        for it in items:
            yield {
                "image": torch.from_numpy(
                    np.ascontiguousarray(
                        it["image"].transpose(0, 3, 1, 2))).float(),
                "image_aug": torch.from_numpy(
                    np.ascontiguousarray(
                        it["image_aug"].transpose(0, 3, 1, 2))).float(),
                "homography": torch.from_numpy(
                    np.asarray(it["homography"]))[None].float(),
            }

    cv2.setRNGSeed(cv2_seed)
    rep, loc, c1, c3, c5, ms, auc = ref_kp.evaluate_keypoint_net(
        loader(), tmodel, output_shape=(EVAL_W, EVAL_H), top_k=top_k)
    return {"repeatability": float(rep), "localization_error": float(loc),
            "correctness1": float(c1), "correctness3": float(c3),
            "correctness5": float(c5), "mscore": float(ms),
            "homography_auc": {str(k): float(v) for k, v in auc.items()}}


def our_keypoint_eval(variables, cfg, items, top_k, cv2_seed=0):
    import cv2

    from nanovs_slam_tpu.evaluation.keypoints import evaluate_keypoint_net
    from nanovs_slam_tpu.inference import make_infer_fn

    infer = make_infer_fn(
        __import__("nanovs_slam_tpu.models.kp2dtiny",
                   fromlist=["build_model"]).build_model(cfg),
        cfg, EVAL_H, EVAL_W)

    def infer_np(images):
        out = infer(variables, images)
        return {k: np.asarray(v) for k, v in out.items()}

    cv2.setRNGSeed(cv2_seed)
    r = evaluate_keypoint_net(items, infer_np, output_shape=(EVAL_W, EVAL_H),
                              top_k=top_k)
    r["homography_auc"] = {str(k): float(v)
                           for k, v in r["homography_auc"].items()}
    return r


def run_keypoints(args):
    from nanovs_slam_tpu.data.hpatches import (HPatchesDataset,
                                               ensure_synthetic_hpatches)

    tmodel, cfg, variables = build_weight_pair(args.ckpt, args.score_bias)
    root = args.hpatches or ensure_synthetic_hpatches()
    ds = HPatchesDataset(root, (EVAL_W, EVAL_H))
    items = list(ds)
    if args.max_items:
        items = items[: args.max_items]
    print(f"{len(items)} fixture pairs @ {EVAL_W}x{EVAL_H}")

    ours = our_keypoint_eval(variables, cfg, items, args.top_k)
    print("ours:", {k: v for k, v in ours.items() if not isinstance(v, dict)})
    ref = ref_keypoint_eval(tmodel, items, args.top_k)
    print("ref: ", {k: v for k, v in ref.items() if not isinstance(v, dict)})

    deltas = {k: abs(ours[k] - ref[k]) for k in ref
              if not isinstance(ref[k], dict)}
    print("abs deltas:", deltas)

    # Noise-floor control (same device as the VO eps control below): the
    # metric tail is deterministic but CHAOTIC — near-tied scores flip
    # top-k membership / the 0.7 gate, and @1px homography correctness is
    # knife-edge. Evaluating OUR stack against an eps-perturbed (1e-7
    # relative) copy of its own weights bounds the delta two bit-identical
    # pipelines can legitimately show; ours-vs-ref deltas within this
    # floor are runtime float noise (XLA vs torch summation order), not a
    # stack difference.
    import jax.tree_util as jtu
    eps_vars = jtu.tree_map(
        lambda x: x * (1.0 + 1e-7) if hasattr(x, "dtype")
        and np.issubdtype(np.asarray(x).dtype, np.floating) else x,
        variables)
    ours_eps = our_keypoint_eval(eps_vars, cfg, items, args.top_k)
    noise = {k: abs(ours[k] - ours_eps[k]) for k in deltas}
    print("noise floor (ours vs eps-perturbed ours):", noise)

    out = {"reference": ref, "ours": ours, "deltas": deltas,
           "ours_eps_sensitivity": noise,
           "top_k": args.top_k, "n_pairs": len(items),
           "ckpt": args.ckpt, "score_bias": args.score_bias}

    if args.seed_sweep > 1:
        # VERDICT r3 #8: pin the correctness@1 delta — cv2.findHomography
        # (cv2.RANSAC) is the only stochastic stage of this metric tail;
        # sweeping cv2.setRNGSeed over BOTH stacks shows whether the
        # @1 gap is RANSAC draw sensitivity (distributions overlap) or a
        # real stack difference (they separate).
        sweep = {"ours": [], "reference": []}
        for seed in range(args.seed_sweep):
            o = our_keypoint_eval(variables, cfg, items, args.top_k,
                                  cv2_seed=seed)
            r = ref_keypoint_eval(tmodel, items, args.top_k,
                                  cv2_seed=seed)
            sweep["ours"].append(o["correctness1"])
            sweep["reference"].append(r["correctness1"])
            print(f"seed {seed}: ours@1={o['correctness1']:.4f} "
                  f"ref@1={r['correctness1']:.4f}")
        for k, v in sweep.items():
            a = np.asarray(v)
            print(f"{k}@1: min={a.min():.4f} mean={a.mean():.4f} "
                  f"max={a.max():.4f}")
        out["seed_sweep_correctness1"] = sweep
    return out


# ----------------------------------------------------------------------- vo

def run_vo(args):
    import cv2

    from nanovs_slam_tpu.vo.frontend import KP2DTinyFrontend
    from nanovs_slam_tpu.vo.visual_odometry import evaluate_visual_odometry

    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from make_synthetic_kitti import make_corridor_sequence

    tmodel, cfg, variables = build_weight_pair(args.ckpt, args.score_bias)

    # The corridor fixture (ground + walls, forward motion) has real depth
    # parallax. The older lateral-shift fixture is a single plane under
    # translation — degenerate for essential-matrix estimation, where two
    # numerically near-identical stacks can recover different poses.
    fixture = os.path.join(_REPO, "fixtures", "kitti_corridor_gray")
    if not os.path.exists(os.path.join(fixture, "06.txt")):
        make_corridor_sequence(fixture, args.frames, gray=True)
        print(f"generated corridor KITTI fixture: {args.frames} frames")

    _, ref_vo = ref_shims.import_ref_eval()

    from nanovs_slam_tpu.models.kp2dtiny import build_model

    # ours
    cv2.setRNGSeed(0)
    frontend = KP2DTinyFrontend(build_model(cfg), cfg, variables,
                                (args.size[0], args.size[1]),
                                nn_thresh=0.7,
                                top_k=4000)  # mirrors the reference's
    # fixed VO keypoint budget (visual_odometry.py:75) — not tunable,
    # or the two stacks would run different populations
    ours = evaluate_visual_odometry(
        frontend, fixture, "06.txt", "06.mp4",
        new_size=args.size, verbose=True, matcher="bf")

    # reference (torch, full-res frames resized by the kornia shim)
    cv2.setRNGSeed(0)
    tmodel.training = False
    ref = ref_vo.evaluate_visual_odometry(
        tmodel, fixture, "06.txt", "06.mp4", "cpu",
        new_size=args.size, verbose=True)

    # NOISE-FLOOR CONTROL: the reference against ITSELF with an
    # epsilon-perturbed copy of its own weights (1e-7 relative — bf16/f32
    # round-off scale). cv2.setRNGSeed does NOT vary USAC_MSAC (verified:
    # seed 0 vs 1 gives bitwise-equal results), so the pipeline is
    # deterministic but CHAOTIC: eps-level numeric differences flip
    # ratio-test survivors and the RANSAC consensus set. Between-stack
    # deltas are only meaningful relative to this same-stack sensitivity.
    import copy

    import torch

    ref_model2 = copy.deepcopy(tmodel)
    with torch.no_grad():
        for p in ref_model2.parameters():
            p.mul_(1.0 + 1e-7)
    cv2.setRNGSeed(0)
    ref2 = ref_vo.evaluate_visual_odometry(
        ref_model2, fixture, "06.txt", "06.mp4", "cpu",
        new_size=args.size, verbose=True)

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if k == "trajectory" or "timing" in k:  # arrays / wall-clock
                continue
            if isinstance(v, dict):
                out.update(flat(v, prefix=f"{prefix}{k}_"))
            elif np.isscalar(v):
                out[f"{prefix}{k}"] = float(v)
        return out

    fo, fr, fr2 = flat(ours), flat(ref), flat(ref2)
    rel, noise = {}, {}
    for k in fr:
        denom = max(abs(fr[k]), 1e-9)
        if k in fo:
            rel[k] = abs(fo[k] - fr[k]) / denom
        if k in fr2:
            noise[k] = abs(fr2[k] - fr[k]) / denom
    print("ours:", fo)
    print("ref: ", fr)
    print("rel deltas (ours vs ref):",
          {k: round(v, 4) for k, v in rel.items()})
    print("noise floor (ref vs eps-perturbed ref):",
          {k: round(v, 4) for k, v in noise.items()})
    return {"reference": fr, "ours": fo, "rel_deltas": rel,
            "reference_eps_sensitivity": noise,
            "frames": args.frames, "size": list(args.size),
            "ckpt": args.ckpt, "score_bias": args.score_bias}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["keypoints", "vo"], required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--score-bias", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=300)
    ap.add_argument("--max-items", type=int, default=0)
    ap.add_argument("--hpatches", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--seed-sweep", type=int, default=0,
                    help="repeat the keypoint eval over N cv2 RNG seeds "
                         "on BOTH stacks and report the correctness@1 "
                         "distributions")
    ap.add_argument("--size", type=int, nargs=2, default=(184, 616),
                    help="VO inference H W (must be cell-divisible)")
    args = ap.parse_args()

    res = (run_keypoints if args.task == "keypoints" else run_vo)(args)
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    out = os.path.join(_REPO, "artifacts", f"pipeline_parity_{args.task}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
