#!/usr/bin/env python
"""Score-calibration probe (VERDICT r2 "Next round" #2).

Question: after self-supervised training on the synthetic set, no score
crosses the reference's 0.7 confidence gate (frontend.py:108,
keypoints.py:84). Is that a bug in this repo's loss math, or a property
of the USP score dynamics on this data that the reference trainer shares?

Experiment: run the REFERENCE torch trainer (KeypointNetwithIOLoss,
keypoint losses only) and THIS framework's trainer side-by-side from
IDENTICAL initial weights (torch init imported via
utils/torch_import.convert_state_dict) on IDENTICAL precomputed batches
(same homographies, same augmentations), and record the score-map
distribution (p50/p90/p99/max, frac>0.5/0.7) on a fixed eval image every
N steps. If the two trajectories agree, the loss math is equivalent and
the 0.7 question is a data/training-length property, not a porting bug.

Usage: python tools/score_probe.py [--steps 300] [--log-every 25]
Writes artifacts/score_probe.json.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # apples-to-apples with torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import ref_shims  # noqa: E402

H, W = 96, 128
BATCH = 8
CONFIG = "N"
N_CLASSES = 8
LR = 1e-3


def make_batches(n_steps, seed=7):
    """Precompute identical training batches with OUR pipeline."""
    from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
    from nanovs_slam_tpu.data.pipeline import PairLoader

    ds = SyntheticShapesDataset((H, W), 64, N_CLASSES, seed=seed)
    out = []
    while len(out) < n_steps:
        loader = PairLoader(ds, BATCH, H, W, d_f=2, train=True,
                            seed=seed + len(out))
        for b in loader:
            out.append({k: np.asarray(v) for k, v in b.items()})
            if len(out) >= n_steps:
                break
    return out


def score_stats(score_map):
    """score_map: (Hc,Wc) raw sigmoid scores, interior cells only."""
    s = np.asarray(score_map)[1:-1, 1:-1].ravel()
    return {"p50": float(np.percentile(s, 50)),
            "p90": float(np.percentile(s, 90)),
            "p99": float(np.percentile(s, 99)),
            "max": float(s.max()),
            "frac_gt_05": float((s > 0.5).mean()),
            "frac_gt_07": float((s > 0.7).mean())}


def run_torch(batches, eval_img, log_every, no_drop=False):
    ref_shims.install()
    import torch
    from kp2dtiny.models.KeypointNetwithIOLoss import KeypointNetwithIOLoss

    torch.manual_seed(0)
    lw = {"keypoint_loss": 1.0, "descriptor_loss": 2.0, "score_loss": 1.0,
          "segmentation_loss": 0.0, "vlad_loss": 0.0, "depth_loss": 0.0,
          "io_loss": 1.0, "loc_loss": 1.0, "huber_loss": 1.0}
    model = KeypointNetwithIOLoss(lw, keypoint_net_learning_rate=LR,
                                  keypoint_net_type="KP2DtinyV2",
                                  device="cpu", n_classes=N_CLASSES,
                                  config=CONFIG, top_k=300)
    model.set_train_flags({"keypoints": True, "segmentation": False,
                           "visloc": False, "depth": False})
    if no_drop:  # exact loss-math comparison mode: no stochastic masks
        for m in model.keypoint_net.modules():
            if isinstance(m, torch.nn.Dropout2d):
                m.p = 0.0
    sd0 = {k: v.clone() for k, v in model.keypoint_net.state_dict().items()}
    io_sd0 = {k: v.clone() for k, v in model.io_net.state_dict().items()}
    opt = torch.optim.Adam(model.optim_params, lr=LR)

    ev = torch.from_numpy(eval_img.transpose(2, 0, 1))[None]

    def eval_scores():
        model.keypoint_net.eval()
        with torch.no_grad():
            out = model.keypoint_net(ev)
        model.keypoint_net.train()
        return out["score"][0, 0].numpy()

    traj = [dict(step=0, **score_stats(eval_scores()))]
    losses = []
    for i, b in enumerate(batches):
        data = {"image": torch.from_numpy(
                    b["image"].transpose(0, 3, 1, 2)).float(),
                "image_aug": torch.from_numpy(
                    b["image_aug"].transpose(0, 3, 1, 2)).float(),
                "homography": torch.from_numpy(b["homography"]).float()}
        loss, loss_dict, _ = model(data)
        loss.backward()
        for g in opt.param_groups:
            torch.nn.utils.clip_grad_value_(g["params"], 1.0)
        opt.step()
        opt.zero_grad()
        losses.append(float(loss.detach()))
        if (i + 1) % log_every == 0:
            st = dict(step=i + 1, loss=float(np.mean(losses[-log_every:])),
                      **{k: float(v) for k, v in loss_dict.items()
                         if hasattr(v, "item") or np.isscalar(v)},
                      **score_stats(eval_scores()))
            traj.append(st)
            print("torch", st, flush=True)
    return (sd0, io_sd0), traj


def run_jax(batches, eval_img, sds, log_every, no_drop=False):
    sd0, io_sd0 = sds
    import jax
    import jax.numpy as jnp

    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model
    from nanovs_slam_tpu.train.schedules import LossWeights
    from nanovs_slam_tpu.train.train_step import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step)
    from nanovs_slam_tpu.utils.torch_import import (
        convert_inlier_net_state_dict, convert_state_dict)

    cfg = get_config(CONFIG, v3=False, n_classes=N_CLASSES)
    if no_drop:
        import dataclasses
        cfg = dataclasses.replace(cfg, with_drop=False)
    model = build_model(cfg)
    tx = make_optimizer("adam", lr=LR)
    rng = jax.random.PRNGKey(0)
    state, io_net = create_train_state(model, cfg, rng, (1, H, W, 3), tx,
                                       with_io=True, io_top_k=300)
    params, batch_stats = convert_state_dict(sd0)
    from nanovs_slam_tpu.utils.checkpoint import merge_params
    io_params, io_bs = convert_inlier_net_state_dict(io_sd0)
    state = state.replace(params=merge_params(state.params, params),
                          batch_stats=merge_params(state.batch_stats,
                                                   batch_stats),
                          io_params=merge_params(state.io_params, io_params),
                          io_batch_stats=merge_params(state.io_batch_stats,
                                                      io_bs))
    flags = {"keypoints": True, "segmentation": False, "visloc": False,
             "depth": False}
    step_fn = make_train_step(model, cfg, H, W, io_net=io_net,
                              train_flags=flags, io_top_k=300, donate=False)
    weights = LossWeights(keypoint_loss=1.0, loc_loss=1.0, io_loss=1.0,
                          score_loss=1.0, descriptor_loss=2.0,
                          segmentation_loss=0.0, vlad_loss=0.0,
                          depth_loss=0.0, huber_loss=1.0)
    ev = jnp.asarray(eval_img)[None]

    def eval_scores(state):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, ev, False)
        return np.asarray(out["score"][0, ..., 0])

    traj = [dict(step=0, **score_stats(eval_scores(state)))]
    losses = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, weights,
                                 jax.random.fold_in(rng, i))
        losses.append(float(metrics["total_loss"]))
        if (i + 1) % log_every == 0:
            st = dict(step=i + 1, loss=float(np.mean(losses[-log_every:])),
                      **{k: float(v) for k, v in metrics.items()},
                      **score_stats(eval_scores(state)))
            traj.append(st)
            print("jax  ", st, flush=True)
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--no-drop", action="store_true",
                    help="disable dropout both sides for exact loss-math comparison")
    args = ap.parse_args()

    batches = make_batches(args.steps)
    eval_img = batches[0]["image"][0]  # fixed probe image, [-1,1] NHWC

    sd0, torch_traj = run_torch(batches, eval_img, args.log_every,
                            no_drop=args.no_drop)
    jax_traj = run_jax(batches, eval_img, sd0, args.log_every,
                   no_drop=args.no_drop)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/score_probe.json", "w") as f:
        json.dump({"torch": torch_traj, "jax": jax_traj,
                   "config": dict(H=H, W=W, batch=BATCH, config=CONFIG,
                                  lr=LR, steps=args.steps)}, f, indent=1)
    print("\nfinal torch:", torch_traj[-1])
    print("final jax:  ", jax_traj[-1])


if __name__ == "__main__":
    main()
