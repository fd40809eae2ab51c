"""End-to-end training demonstrations for the two task heads that
lacked one (VERDICT r3 #3 visloc, #7 depth), scaled down to slow-tier
test budgets.

- train_visloc: full loop (k-means NetVLAD init -> descriptor cache ->
  violating-negative mining -> triplet steps) on the seeded synthetic
  Pittsburgh fixture (scripts/make_synthetic_pittsburgh.py); Recall@1
  must not degrade and the loop must actually mine + train.
  Reference: train_visloc.py:199-294.
- depth head: SILog/abs_rel improve over a short synthetic train run.
  Reference: KeypointNetwithIOLoss.py:587-603, evaluation/
  depth_estimation.py:85.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout=2400):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(cmd, cwd=_REPO, env=env, timeout=timeout,
                          capture_output=True, text=True)


def test_train_visloc_end_to_end(tmp_path):
    """Cluster init -> cache -> mining -> triplet training on the
    Pittsburgh-format fixture; the recall curve is recorded and the
    final Recall@1 does not fall below init (it improved 0.375 -> 0.5
    on the reference run of this config; with a seeded fixture a
    regression below init means the mining/loss wiring broke)."""
    out = tmp_path / "recall.json"
    r = _run([sys.executable, "train_visloc.py", "--synthetic",
              "--config", "N", "--n_classes", "8",
              "--im_h", "96", "--im_w", "128",
              "--n_epochs", "1", "--n_neg", "3", "--max_queries", "8",
              "--cluster_images", "20", "--cluster_samples", "2000",
              "--eval_recall", "--recall_out", str(out),
              "--out_model_path", str(tmp_path / "ckpt")])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    curve = json.load(open(out))["recall_curve"]
    tags = [row["tag"] for row in curve]
    assert tags[0] == "init" and tags[-1] == "final"
    assert curve[-1]["recall@1"] >= curve[0]["recall@1"], curve
    # the loop must have actually trained (queries mined, loss finite)
    assert "queries, mean loss" in r.stdout


def test_depth_head_trains(tmp_path):
    """--depth on the synthetic depth-GT dataset: SILog and abs_rel
    improve from the first eval to the last, and depth example images
    are written (train_multitask.py save_depth_examples)."""
    r = _run([sys.executable, "train_multitask.py",
              "--dataset_name", "synthetic",
              "--model_type", "KP2DtinyV3", "--config", "N", "--depth",
              "--batch_size", "8", "--n_epochs", "16",
              "--eval_every", "5", "--synthetic_items", "32",
              "--max_eval_items", "8",
              "--out_model_path", str(tmp_path / "ckpt")],
             timeout=3600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # eval results are printed per eval epoch as "E<n> val: {json}"
    rows = []
    for line in r.stdout.splitlines():
        if " val: " in line and '"depth"' in line:
            payload = json.loads(line.split(" val: ", 1)[1])
            if isinstance(payload.get("depth"), dict) \
                    and "silog" in payload["depth"]:
                rows.append(payload["depth"])
    assert len(rows) >= 2, f"no depth eval rows in stdout:\n" \
                           f"{r.stdout[-2000:]}"
    assert np.isfinite(rows[-1]["silog"])
    assert rows[-1]["silog"] < rows[0]["silog"], (rows[0], rows[-1])
    assert rows[-1]["abs_rel"] < rows[0]["abs_rel"], (rows[0], rows[-1])
    media = str(tmp_path / "ckpt") + "_media"
    examples = [p for p in os.listdir(media)
                if p.startswith("depth_examples")]
    assert examples, "no depth example images written"
