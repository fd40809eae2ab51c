"""Adaptive width pruning for LightGlue, TPU-style.

Behavioral contract (reference lightglue/lightglue.py:564-594):
after each non-final layer the reference drops "confident-and-
unmatchable" keypoints — keep = matchability > (1 - width_confidence)
OR token_confidence <= confidence_threshold(layer) (:619-624) — shrinks
the attention tensors to the survivors (index_select, :568-579), and at
the end scatters matches back to the original index space (:585-594).
That is a dynamic-shape gather loop: fine on a GPU stream, hostile to
XLA's trace-once/static-shape model.

The TPU-native formulation used here is STATIC BUCKET COMPACTION:

- the prune schedule is fixed at trace time: after each of the first
  `n_prunes` non-final layers the keypoint axis is HALVED (N -> N/2 ->
  N/4, floored at `min_bucket`). Every stage therefore has a static
  shape and the whole pipeline — embed, all layers, prunes, assignment,
  scatter-back — compiles to ONE XLA program; no host round-trips
  (unlike the host-staged adaptive DEPTH in `matching/adaptive.py`,
  which must sync a scalar per layer because the host picks the depth).
- at a prune point every keypoint gets a rank: keep-flagged points
  (reference rule above) rank strictly above non-keep points, with
  matchability as the tiebreak; padded slots rank below everything.
  `lax.top_k` selects the bucket, a fixed-shape gather compacts
  descriptors / rotary encodings / masks, and the selected original
  indices ride along for the final scatter.
- non-keep points that land in the bucket only because fewer than
  bucket-size points were keep-flagged are MASKED OUT (validity mask
  False), so downstream attention and assignment treat them exactly as
  the reference treats pruned points. Conversely, when MORE than
  bucket-size points are keep-flagged, the lowest-matchability keeps
  are dropped — the one deviation from the reference's unbounded keep
  set, bounded by choosing buckets >= the expected keep count.

Exactness property (tested): when every valid keypoint fits in the
final bucket and is keep-flagged (e.g. width_confidence = 1, valid
count <= min_bucket), the pruned program's outputs equal the unpruned
LightGlue forward bit-for-bit — compaction then only reorders padding.

The attention matrices after k prunes are 4^k times smaller; the
measured win at K=1024 is in `bench_latency.py --width_pruning` /
docs/KERNELS.md.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .lightglue import LightGlue, confidence_threshold

Array = jnp.ndarray


def _take_points(t: Array, sel: Array) -> Array:
    """Gather along the keypoint axis. t (B, N, ...) or rotary
    (B, 1, N, dh); sel (B, k)."""
    if t.ndim == 4:  # rotary cos/sin: (B, 1, N, dh)
        return jnp.take_along_axis(t, sel[:, None, :, None], axis=2)
    if t.ndim == 3:  # descriptors: (B, N, d)
        return jnp.take_along_axis(t, sel[:, :, None], axis=1)
    return jnp.take_along_axis(t, sel, axis=1)  # (B, N) masks/indices


def prune_schedule(n: int, n_layers: int, min_bucket: int = 128,
                   n_prunes: Optional[int] = None,
                   floor: Optional[int] = None):
    """Bucket size after each non-final layer (len n_layers-1).

    Halve after each of the first `n_prunes` layers, floored at
    max(min_bucket, floor); None = halve as long as the floor allows.
    The reference prunes a data-dependent amount at EVERY layer
    (:564-567); a fixed halving schedule is the static-shape analog.
    `floor` is how engaged_width_forward injects the measured keep
    count: the schedule never compacts below the points the reference's
    keep rule would retain, so a fully-matchable pair (floor >= n)
    yields the identity schedule — no compaction at any layer, exactly
    the reference's automatic no-op (:613-624)."""
    eff_min = max(min_bucket, floor or 0)
    buckets = []
    cur = n
    prunes = 0
    for i in range(n_layers - 1):
        nxt = cur // 2
        if nxt >= eff_min and (n_prunes is None or prunes < n_prunes):
            cur = nxt
            prunes += 1
        buckets.append(cur)
    return buckets


@functools.partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8))
def width_pruned_forward(model: LightGlue, params, data: Dict[str, Array],
                         width_confidence: float = 0.99,
                         rngs=None, min_bucket: int = 128,
                         n_prunes: Optional[int] = None,
                         floor0: Optional[int] = None,
                         floor1: Optional[int] = None) -> Dict[str, Array]:
    """LightGlue inference with static-bucket width pruning.

    data: as for LightGlue.__call__ (normalized keypoints0/1,
    descriptors0/1, optional boolean mask0/1). Returns the standard
    pred dict in the ORIGINAL (B, M)/(B, N) index space, plus
    prune0/prune1 — the number of layers each keypoint survived
    (reference :543-544,579; pruned-at-layer-i points report i+1,
    survivors report n_layers).
    """
    del rngs
    cfg = model.cfg
    v = {"params": params}
    n_layers = cfg.n_layers
    # the keep signal is each layer's assigner matchability (reference
    # :577,583). The reference's torch module always owns all layers'
    # heads; flax creates params lazily, so an inference-only init
    # (train=False) lacks them — fail loudly instead of letting the
    # ScopeParamNotFoundError surface as a generic matcher failure.
    missing = [i for i in range(n_layers - 1)
               if f"log_assignment_{i}" not in params]
    if missing:
        raise ValueError(
            "width pruning needs per-layer assignment heads but params "
            f"lack log_assignment_{missing[0]}; initialize with "
            "model.init(..., train=True) or use a train_lightglue.py "
            "checkpoint (trained with deep supervision)")
    desc0, desc1, enc0, enc1 = model.apply(v, data, method="embed")
    B, M = desc0.shape[:2]
    N = desc1.shape[1]
    mask0 = data.get("mask0")
    mask1 = data.get("mask1")
    if mask0 is None:
        mask0 = jnp.ones((B, M), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, N), bool)
    ind0 = jnp.broadcast_to(jnp.arange(M)[None], (B, M))
    ind1 = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    prune0 = jnp.full((B, M), n_layers, jnp.int32)
    prune1 = jnp.full((B, N), n_layers, jnp.int32)

    sched0 = prune_schedule(M, n_layers, min_bucket, n_prunes, floor0)
    sched1 = prune_schedule(N, n_layers, min_bucket, n_prunes, floor1)

    def compact(i, desc, enc, mask, ind, conf, bucket):
        """One side's prune at layer i: rank, top-k, gather."""
        s = model.apply(v, i, desc, method="matchability")
        keep = s > 1.0 - width_confidence
        if conf is not None:
            # low-confidence points are never pruned (:622-624)
            keep = keep | (conf <= confidence_threshold(i, n_layers))
        # keeps above non-keeps, matchability tiebreak, pads last
        rank = jnp.where(mask, keep.astype(s.dtype) * 2.0 + s, -1.0)
        _, sel = jax.lax.top_k(rank, bucket)
        sel = jnp.sort(sel, axis=-1)  # preserve original point order
        new_mask = _take_points(mask & keep, sel)
        return (_take_points(desc, sel),
                (_take_points(enc[0], sel), _take_points(enc[1], sel)),
                new_mask, _take_points(ind, sel))

    for i in range(n_layers):
        desc0, desc1 = model.apply(v, i, desc0, desc1, enc0, enc1,
                                   mask0, mask1, method="run_layer")
        if i == n_layers - 1:
            break
        do0 = sched0[i] < desc0.shape[1]
        do1 = sched1[i] < desc1.shape[1]
        if not (do0 or do1):
            continue
        # TokenConfidence heads only exist on checkpoints trained with
        # deep supervision; without them the keep rule is matchability
        # alone — exactly the reference's token=None path (:619-621)
        if f"token_confidence_{i}" in params:
            conf0, conf1 = model.apply(v, i, desc0, desc1,
                                       method="token_confidence")
        else:
            conf0 = conf1 = None
        brow = jnp.arange(B)[:, None]

        def alive_map(ind, mask, n):
            """Scatter the bucket's validity back to original indices."""
            return jnp.zeros((B, n), bool).at[brow, ind].max(mask)

        if do0:
            before = alive_map(ind0, mask0, M)
            desc0, enc0, mask0, ind0 = compact(
                i, desc0, enc0, mask0, ind0, conf0, sched0[i])
            # valid before the prune but not after = pruned at layer i
            prune0 = jnp.where(before & ~alive_map(ind0, mask0, M),
                               jnp.minimum(prune0, i + 1), prune0)
        if do1:
            before = alive_map(ind1, mask1, N)
            desc1, enc1, mask1, ind1 = compact(
                i, desc1, enc1, mask1, ind1, conf1, sched1[i])
            prune1 = jnp.where(before & ~alive_map(ind1, mask1, N),
                               jnp.minimum(prune1, i + 1), prune1)

    pred_c = model.apply(v, n_layers - 1, desc0, desc1, mask0, mask1,
                         method="finalize")
    return _scatter_back(pred_c, ind0, ind1, prune0, prune1, B, M, N)


def _scatter_back(pred_c, ind0, ind1, prune0, prune1, B, M, N):
    """Map compacted-space matches back to the original (B, M)/(B, N)
    index space (reference :585-594)."""
    m0c, m1c = pred_c["matches0"], pred_c["matches1"]
    ms0c, ms1c = pred_c["matching_scores0"], pred_c["matching_scores1"]
    brow = jnp.arange(B)[:, None]
    m0_orig = jnp.where(m0c >= 0,
                        jnp.take_along_axis(ind1, jnp.maximum(m0c, 0),
                                            axis=1), -1)
    m1_orig = jnp.where(m1c >= 0,
                        jnp.take_along_axis(ind0, jnp.maximum(m1c, 0),
                                            axis=1), -1)
    m0 = jnp.full((B, M), -1, m0c.dtype).at[brow, ind0].set(m0_orig)
    m1 = jnp.full((B, N), -1, m1c.dtype).at[brow, ind1].set(m1_orig)
    ms0 = jnp.zeros((B, M), ms0c.dtype).at[brow, ind0].set(ms0c)
    ms1 = jnp.zeros((B, N), ms1c.dtype).at[brow, ind1].set(ms1c)
    return {"matches0": m0, "matches1": m1,
            "matching_scores0": ms0, "matching_scores1": ms1,
            "prune0": prune0, "prune1": prune1}


@functools.partial(jax.jit, static_argnums=(0, 3))
def _keep_count_probe(model: LightGlue, params, data: Dict[str, Array],
                      width_confidence: float):
    """Max-over-batch keep counts after layer 0 for both sides — the
    reference's keep rule (:619-624) evaluated once where the first
    prune would happen. One small program, one host fetch."""
    v = {"params": params}
    cfg = model.cfg
    desc0, desc1, enc0, enc1 = model.apply(v, data, method="embed")
    B, M = desc0.shape[:2]
    N = desc1.shape[1]
    mask0 = data.get("mask0", jnp.ones((B, M), bool))
    mask1 = data.get("mask1", jnp.ones((B, N), bool))
    d0, d1 = model.apply(v, 0, desc0, desc1, enc0, enc1, mask0, mask1,
                         method="run_layer")
    if f"token_confidence_{0}" in params:
        conf0, conf1 = model.apply(v, 0, d0, d1,
                                   method="token_confidence")
    else:
        conf0 = conf1 = None

    def count(desc, mask, conf):
        s = model.apply(v, 0, desc, method="matchability")
        keep = s > 1.0 - width_confidence
        if conf is not None:
            keep = keep | (conf <= confidence_threshold(0, cfg.n_layers))
        return (keep & mask).sum(axis=1).max()

    # stacked so the caller fetches BOTH counts in one host round trip
    return jnp.stack([count(d0, mask0, conf0), count(d1, mask1, conf1)])


def _pow2_at_least(k: int, min_bucket: int) -> int:
    b = max(min_bucket, 1)
    while b < k:
        b *= 2
    return b


def engaged_width_forward(model: LightGlue, params, data: Dict[str, Array],
                          width_confidence: float = 0.99,
                          min_bucket: int = 128,
                          n_prunes: Optional[int] = None
                          ) -> Dict[str, Array]:
    """Width pruning with the reference's AUTOMATIC engagement semantics
    (lightglue.py:613-624): the reference prunes only the points its
    keep rule rejects, so on fully-matchable scenes it no-ops by
    construction. The static bucket alone cannot do that — it FORCES a
    fixed compaction fraction, measured to destroy recall exactly where
    the reference would have pruned nothing
    (artifacts/width_pruning_quality_r4.json: held-out recall
    0.493 -> 0.163, corridor VO 0.0441 -> 0.1270).

    This wrapper restores the automatic behavior with ONE host-read
    scalar pair (the same staging trick as matching/adaptive.py): probe
    the keep counts where the first prune would happen, round up to the
    next power of two >= min_bucket, and pass that as the schedule
    FLOOR — the compiled program never compacts below what the keep
    rule retains. Fully-matchable pairs select the identity schedule
    (bit-equal to the plain forward); junk-heavy pairs keep the full
    halving schedule and its measured speedup (1.46x at K=1024
    on-chip). The bucket menu is the power-of-two ladder between
    min_bucket and N, so at most log2(N/min_bucket)+1 programs compile
    per side.

    Cost of engagement: embed + layer 0 run twice (~1/n_layers extra
    compute) + one scalar-fetch round trip (~25-30 ms on a tunneled
    backend; see docs/KERNELS.md for when that pays).
    """
    import numpy as np

    counts = np.asarray(_keep_count_probe(model, params, data,
                                          width_confidence))
    M = data["descriptors0"].shape[1]
    N = data["descriptors1"].shape[1]
    f0 = _pow2_at_least(int(counts[0]), min_bucket)
    f1 = _pow2_at_least(int(counts[1]), min_bucket)
    if f0 >= M and f1 >= N:
        # nothing prunable anywhere: the reference would keep every
        # point at every layer — run the plain static program
        pred = dict(model.apply({"params": params}, data))
        B = data["descriptors0"].shape[0]
        pred["prune0"] = jnp.full((B, M), model.cfg.n_layers, jnp.int32)
        pred["prune1"] = jnp.full((B, N), model.cfg.n_layers, jnp.int32)
        return pred
    return width_pruned_forward(model, params, data, width_confidence,
                                None, min_bucket, n_prunes,
                                min(f0, M), min(f1, N))
