"""VPR retrieval metrics: Recall@N, AUC@N, MatchRatio@N.

Metric definitions match the reference
(src/evaluation/global_descriptor.py:55-105). The reference builds a faiss
IndexFlatL2; here the exact L2 search is ONE (Q, D) x (D, N) matmul on the
accelerator (jnp.argsort over the distance matrix) — faster on TPU than a
host-side index for these descriptor counts, and bit-identical results.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def knn_l2(queries: np.ndarray, database: np.ndarray, k: int) -> np.ndarray:
    """Exact L2 top-k indices (Q, k) via device matmul."""
    q = jnp.asarray(queries, jnp.float32)
    db = jnp.asarray(database, jnp.float32)
    d2 = (jnp.sum(q * q, 1)[:, None] - 2.0 * q @ db.T
          + jnp.sum(db * db, 1)[None, :])
    _, idx = jax.lax.top_k(-d2, k)
    return np.asarray(idx)


def retrieval_metrics(predictions: np.ndarray, positives: Sequence[np.ndarray],
                      num_queries: int,
                      n_values: Sequence[int] = (1, 5, 10, 20)
                      ) -> Dict[str, Dict[int, float]]:
    """predictions (Q, max_n) ranked db indices; positives[q] = GT indices."""
    n_max = max(n_values)
    match_ratio_at_n = np.zeros(len(n_values))
    count_n = np.zeros(len(n_values))
    correct_hist = np.zeros(n_max)

    for q_ix, pred in enumerate(predictions):
        correct = np.isin(pred[:n_max], positives[q_ix])
        total = len(positives[q_ix])
        if np.any(correct):
            first_hit = np.where(correct)[0].min()
            correct_hist[first_hit:] += 1
        for i, n in enumerate(n_values):
            if total > 0:
                match_ratio_at_n[i] += correct[:n].sum() / min(total, n)
                count_n[i] += 1

    match_ratio_at_n = match_ratio_at_n / np.maximum(count_n, 1)
    recall_hist = correct_hist / num_queries

    recalls, auc, match_ratio = {}, {}, {}
    for i, n in enumerate(n_values):
        recalls[n] = float(recall_hist[n - 1])
        auc[n] = float(np.sum(recall_hist[:n]) / n)
        match_ratio[n] = float(match_ratio_at_n[i])
    return {"Recall": recalls, "AUC": auc, "MatchRatio": match_ratio}


def evaluate_global_descriptor(db_features: np.ndarray,
                               query_features: np.ndarray,
                               positives: Sequence[np.ndarray],
                               n_values: Sequence[int] = (1, 5, 10, 20)
                               ) -> Dict[str, Dict[int, float]]:
    predictions = knn_l2(query_features, db_features, max(n_values))
    return retrieval_metrics(predictions, positives, len(query_features),
                             n_values)
