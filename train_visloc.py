#!/usr/bin/env python
"""VPR (visual place recognition) finetuning driver.

CLI contract mirrors the reference train_visloc.py:
- NetVLAD centroid init: sample dense encoder descriptors over the train
  set, k-means them, compute alpha/assignment weights
  (get_clusters :119-184, netvlad.py:50-63) — k-means via sklearn
  MiniBatchKMeans (faiss is not available in this environment; identical
  contract: centroids in, init params out).
- epoch loop: rebuild the full-dataset descriptor cache, mine
  (query, best positive, violating negatives) triplets against it, train
  with per-negative TripletMarginLoss(margin=sqrt(margin), sum reduction)
  (:199-294, :410-412).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="VPR finetune")
    p.add_argument("--config", default="S")
    p.add_argument("--model_type", default="KP2DtinyV2")
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--model_path", default=None)
    p.add_argument("--out_model_path", default="visloc_ckpt")
    p.add_argument("--dataset_config", default="datasets.json")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--n_epochs", type=int, default=5)
    p.add_argument("--margin", type=float, default=0.1)
    p.add_argument("--n_neg", type=int, default=10)
    p.add_argument("--im_h", type=int, default=240)
    p.add_argument("--im_w", type=int, default=320)
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--cluster_samples", type=int, default=50000)
    p.add_argument("--cluster_images", type=int, default=500)
    p.add_argument("--max_queries", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pittsburgh_path", default=None,
                   help="dataset root override (else datasets.json)")
    p.add_argument("--synthetic", action="store_true",
                   help="fall back to the seeded Pittsburgh-format "
                        "fixture when no real dataset is configured")
    p.add_argument("--eval_recall", action="store_true",
                   help="report Recall@1/5 from each epoch's descriptor "
                        "cache (init + per epoch) and save the curve to "
                        "--recall_out")
    p.add_argument("--recall_out", default=None,
                   help="JSON artifact path for the recall curve")
    return p.parse_args()


def get_clusters(model, variables, dataset, cfg, n_images, n_samples,
                 seed=0):
    """Sample dense encoder descriptors and k-means them
    (train_visloc.py:119-184)."""
    from sklearn.cluster import MiniBatchKMeans

    rs = np.random.RandomState(seed)
    only_enc = jax.jit(lambda v, x: model.apply(v, x, False, True))
    descs = []
    per_image = int(np.ceil(n_samples / n_images))
    idxs = rs.choice(len(dataset), min(n_images, len(dataset)),
                     replace=False)
    for i in idxs:
        img = dataset[int(i)]
        x = jnp.asarray(img[None] if img.ndim == 3 else img)
        d = np.asarray(only_enc(variables, x))  # (1, h, w, C)
        d = d.reshape(-1, d.shape[-1])
        sel = rs.choice(len(d), min(per_image, len(d)), replace=False)
        descs.append(d[sel])
    descs = np.concatenate(descs)[:n_samples].astype(np.float32)
    km = MiniBatchKMeans(n_clusters=cfg.num_clusters, n_init=3,
                         random_state=seed).fit(descs)
    return km.cluster_centers_.astype(np.float32), descs


def triplet_margin_loss(q, pos, neg, margin):
    """torch TripletMarginLoss(margin, reduction='sum') over one (q, n)
    pair at a time like the reference (:249-294)."""
    d_pos = jnp.linalg.norm(q - pos + 1e-6, axis=-1)
    d_neg = jnp.linalg.norm(q - neg + 1e-6, axis=-1)
    return jnp.sum(jnp.maximum(d_pos - d_neg + margin, 0.0))


def main():
    args = parse_args()
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.data.datasets import load_datasets_json
    from nanovs_slam_tpu.data.pittsburgh import (TripletMiningDataset,
                                                 WholeDataset)
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
    from nanovs_slam_tpu.modules.aggregators import NetVLAD
    from nanovs_slam_tpu.utils.checkpoint import (load_checkpoint,
                                                  save_checkpoint)

    import optax

    H, W = args.im_h, args.im_w
    v3 = args.model_type in ("KP2DtinyV3", "DF")
    cfg = get_config(args.config, v3=v3, n_classes=args.n_classes)
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(args.seed),
                                     (1, H, W, 3))
    if args.model_path:
        if os.path.isdir(args.model_path) or \
                args.model_path.endswith(".npz"):
            tree, _ = load_checkpoint(args.model_path)
            params, batch_stats = tree["params"], tree["batch_stats"]
        else:
            from nanovs_slam_tpu.utils.torch_import import \
                load_torch_checkpoint

            params, batch_stats, _ = load_torch_checkpoint(args.model_path)

    paths = load_datasets_json(args.dataset_config)
    root = args.pittsburgh_path or paths.get("pittsburgh_data_path")
    train_struct = os.path.join(root or "", "datasets", "pitts30k_train.mat")
    if not (root and os.path.exists(train_struct)):
        if not args.synthetic:
            print("pittsburgh_data_path missing — nothing to train on "
                  "(pass --synthetic for the seeded fixture)")
            return 1
        # seeded Pittsburgh-format fixture (same policy as the multitask
        # trainer's synthetic-KITTI / synthetic-HPatches fallbacks)
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from make_synthetic_pittsburgh import ensure_synthetic_pittsburgh

        root = ensure_synthetic_pittsburgh()
        train_struct = os.path.join(root, "datasets", "pitts30k_train.mat")

    whole = WholeDataset(train_struct, root, (H, W))
    miner = TripletMiningDataset(train_struct, root, (H, W),
                                 n_neg=args.n_neg, margin=args.margin,
                                 seed=args.seed)

    variables = {"params": params, "batch_stats": batch_stats}

    # --- NetVLAD cluster init (k-means on dense encoder descriptors) ---
    clsts, descs = get_clusters(model, variables, whole, cfg,
                                args.cluster_images, args.cluster_samples,
                                args.seed)
    assign_w, centroids = NetVLAD.init_params_from_clusters(clsts, descs)
    params = dict(params)
    vlad_head = dict(params["vlad_head"])
    netvlad = dict(vlad_head["netvlad"])
    netvlad["assign_w"] = jnp.asarray(assign_w)
    netvlad["centroids"] = jnp.asarray(centroids)
    vlad_head["netvlad"] = netvlad
    params["vlad_head"] = vlad_head
    variables = {"params": params, "batch_stats": batch_stats}
    print("NetVLAD initialized from k-means clusters")

    # --- training ---
    tx = optax.adam(args.lr)

    def vlad_forward(p, x):
        out = model.apply({"params": p, "batch_stats": batch_stats}, x,
                          False)
        return out["vlad"]

    @jax.jit
    def train_step(p, opt_state, q_img, pos_img, neg_imgs):
        def loss_fn(p):
            x = jnp.concatenate([q_img[None], pos_img[None], neg_imgs], 0)
            v = vlad_forward(p, x)
            q, pos, negs = v[0], v[1], v[2:]
            return triplet_margin_loss(q[None], pos[None], negs,
                                       args.margin ** 0.5)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        if args.freeze_backbone:
            grads = {**grads, "backbone": jax.tree_util.tree_map(
                jnp.zeros_like, grads["backbone"])}
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    infer_vlad = jax.jit(lambda p, x: vlad_forward(p, x))
    opt_state = tx.init(params)

    def build_cache(p):
        feats = []
        for i in range(len(whole)):
            feats.append(np.asarray(
                infer_vlad(p, jnp.asarray(whole[i][None])))[0])
        return np.stack(feats)

    recall_curve = []

    def eval_recall(cache, tag):
        """Recall@1/5 straight from the epoch's descriptor cache (the
        db block vs the query block — zero extra forwards)."""
        from nanovs_slam_tpu.evaluation.global_descriptor import \
            evaluate_global_descriptor

        n_db = whole.dbStruct.numDb
        r = evaluate_global_descriptor(cache[:n_db], cache[n_db:],
                                       whole.get_positives(),
                                       n_values=(1, 5))
        row = {"tag": tag,
               "recall@1": r["Recall"][1], "recall@5": r["Recall"][5],
               "auc@5": r["AUC"][5]}
        recall_curve.append(row)
        print(f"[recall] {tag}: R@1={row['recall@1']:.3f} "
              f"R@5={row['recall@5']:.3f} AUC@5={row['auc@5']:.3f}")

    for epoch in range(args.n_epochs):
        # cache phase: full-set descriptors (train_visloc.py:199-227)
        miner.cache = build_cache(params)
        if args.eval_recall:
            eval_recall(miner.cache,
                        "init" if epoch == 0 else f"epoch{epoch - 1}")

        n_q = min(len(miner), args.max_queries or len(miner))
        total, used = 0.0, 0
        for qi in range(n_q):
            mined = miner.mine(qi)
            if mined is None:
                continue
            q_img, pos_img, neg_imgs = mined
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(q_img), jnp.asarray(pos_img),
                jnp.asarray(neg_imgs))
            total += float(loss)
            used += 1
        print(f"epoch {epoch}: {used}/{n_q} queries, "
              f"mean loss {total / max(used, 1):.4f}")
        save_checkpoint(args.out_model_path,
                        {"params": params, "batch_stats": batch_stats},
                        config=vars(args), epoch=epoch + 1)
    if args.eval_recall:
        eval_recall(build_cache(params), "final")
        if args.recall_out:
            import json

            with open(args.recall_out, "w") as f:
                json.dump({"args": {k: v for k, v in vars(args).items()},
                           "recall_curve": recall_curve}, f, indent=2)
            print(f"recall curve -> {args.recall_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
