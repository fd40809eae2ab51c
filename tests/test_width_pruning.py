"""Adaptive width pruning (static bucket compaction) tests.

Reference contract: lightglue/lightglue.py:564-594 (prune_points /
get_pruning_mask / scatter-back) — see matching/width_pruning.py for
the TPU-native formulation being tested.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.matching.lightglue import (LightGlue, LightGlueConfig,
                                                normalize_keypoints)
from nanovs_slam_tpu.matching.width_pruning import (prune_schedule,
                                                    width_pruned_forward)


def _matchable_pair(M, N, n_common, d=32, seed=0):
    """Two keypoint sets sharing n_common descriptors (strong matches);
    the rest are independent noise."""
    rs = np.random.RandomState(seed)
    kpts0 = rs.uniform(0, [320, 240], (1, M, 2)).astype(np.float32)
    kpts1 = rs.uniform(0, [320, 240], (1, N, 2)).astype(np.float32)
    desc0 = rs.randn(1, M, d).astype(np.float32)
    desc1 = rs.randn(1, N, d).astype(np.float32)
    desc1[0, :n_common] = desc0[0, :n_common] + \
        0.05 * rs.randn(n_common, d).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    return {"keypoints0": normalize_keypoints(jnp.asarray(kpts0), (320, 240)),
            "keypoints1": normalize_keypoints(jnp.asarray(kpts1), (320, 240)),
            "descriptors0": jnp.asarray(desc0),
            "descriptors1": jnp.asarray(desc1)}


def test_prune_schedule():
    # 1024 over 9 layers, floor 128: halves 3x then holds
    assert prune_schedule(1024, 9, 128) == [512, 256, 128, 128, 128, 128,
                                            128, 128]
    # n_prunes bound
    assert prune_schedule(1024, 4, 128, n_prunes=1) == [512, 512, 512]
    # already at floor: never prunes
    assert prune_schedule(128, 4, 128) == [128, 128, 128]


def test_exact_equality_when_bucket_holds_all_valid():
    """width_confidence=1 keep-flags every point (matchability > 0 always),
    and all valid points fit in the final bucket — compaction then only
    drops padding, so the pruned program must reproduce the unpruned
    forward: matches EXACTLY, scores to float rounding."""
    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=3,
                          num_heads=4)
    model = LightGlue(cfg)
    M_pad, n_valid = 256, 100
    data = _matchable_pair(M_pad, M_pad, n_common=40)
    mask = np.zeros((1, M_pad), bool)
    mask[0, :n_valid] = True
    data["mask0"] = jnp.asarray(mask)
    data["mask1"] = jnp.asarray(mask)
    params = model.init(jax.random.PRNGKey(0), data, train=True)["params"]

    ref = model.apply({"params": params}, data)
    out = width_pruned_forward(model, params, data,
                               width_confidence=1.0, min_bucket=128)
    np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                  np.asarray(ref["matches0"]))
    np.testing.assert_array_equal(np.asarray(out["matches1"]),
                                  np.asarray(ref["matches1"]))
    # scores: compaction reorders the padded slots, changing softmax
    # summation order — equal to float rounding at matched positions
    # (unmatched near-zero scores can flip mutuality on a rounding tie)
    matched = np.asarray(ref["matches0"])[0] >= 0
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"])[0, matched],
        np.asarray(ref["matching_scores0"])[0, matched],
        rtol=1e-4, atol=2e-6)
    assert np.all(np.asarray(out["matching_scores0"])[0, ~matched] < 1e-3)
    # nothing was keep=False, so nothing reports as pruned
    assert np.all(np.asarray(out["prune0"])[0, :n_valid] == cfg.n_layers)


def test_pruned_points_never_match_and_indices_consistent():
    """Random-init behavioral invariants: matches live in the original
    index space, are mutually consistent, and pruned points report -1."""
    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=4,
                          num_heads=4)
    model = LightGlue(cfg)
    data = _matchable_pair(256, 256, n_common=64, seed=3)
    params = model.init(jax.random.PRNGKey(1), data, train=True)["params"]
    out = width_pruned_forward(model, params, data,
                               width_confidence=0.5, min_bucket=64)
    m0 = np.asarray(out["matches0"])[0]
    m1 = np.asarray(out["matches1"])[0]
    p0 = np.asarray(out["prune0"])[0]
    p1 = np.asarray(out["prune1"])[0]
    assert m0.shape == (256,) and m1.shape == (256,)
    # some pruning actually happened (256 -> 128 -> 64 buckets)
    assert (p0 < cfg.n_layers).sum() >= 256 - 128
    # mutual consistency in the ORIGINAL index space
    for i in np.nonzero(m0 >= 0)[0]:
        assert m1[m0[i]] == i
    # pruned points cannot match
    assert np.all(m0[p0 < cfg.n_layers] == -1)
    assert np.all(m1[p1 < cfg.n_layers] == -1)
    # scores zero exactly where unmatched
    ms0 = np.asarray(out["matching_scores0"])[0]
    assert np.all((ms0 > 0) == (m0 >= 0)) or np.all(ms0[m0 == -1] == 0)


def test_survivors_are_top_matchability():
    """Ranking policy: when every point is keep-flagged
    (width_confidence=1) but the bucket forces drops, the survivors must
    be EXACTLY the top-bucket points by matchability at the prune layer
    — the documented bounded deviation from the reference's unbounded
    keep set. (Whether matchability identifies the truly matchable
    points is a property of trained weights, measured in
    bench_latency.py --width_pruning with the trained checkpoint.)"""
    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=3,
                          num_heads=4)
    model = LightGlue(cfg)
    data = _matchable_pair(256, 256, n_common=48, seed=7)
    params = model.init(jax.random.PRNGKey(2), data, train=True)["params"]
    v = {"params": params}

    # replicate the staged pipeline up to the (single) prune at layer 0
    d0, d1, e0, e1 = model.apply(v, data, method="embed")
    d0, d1 = model.apply(v, 0, d0, d1, e0, e1, None, None,
                         method="run_layer")
    s0 = np.asarray(model.apply(v, 0, d0, method="matchability"))[0]
    expected = set(np.argsort(-s0)[:128].tolist())

    out = width_pruned_forward(model, params, data,
                               width_confidence=1.0, min_bucket=128)
    survivors = set(np.nonzero(
        np.asarray(out["prune0"])[0] == cfg.n_layers)[0].tolist())
    assert survivors == expected


def test_engaged_noop_on_fully_matchable():
    """VERDICT r4 next #4: with width_confidence enabled globally, a
    fully-matchable pair must behave exactly like the unpruned forward —
    the reference's keep rule retains everything, so its pruning no-ops
    automatically (lightglue.py:613-624). engaged_width_forward probes
    the keep count and must select the plain program."""
    from nanovs_slam_tpu.matching.width_pruning import engaged_width_forward

    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=3,
                          num_heads=4)
    model = LightGlue(cfg)
    data = _matchable_pair(256, 256, n_common=64, seed=11)
    params = model.init(jax.random.PRNGKey(0), data, train=True)["params"]

    # width_confidence=1.0 keep-flags every point (matchability > 0)
    out = engaged_width_forward(model, params, data,
                                width_confidence=1.0, min_bucket=128)
    ref = model.apply({"params": params}, data)
    np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                  np.asarray(ref["matches0"]))
    np.testing.assert_array_equal(
        np.asarray(out["matching_scores0"]),
        np.asarray(ref["matching_scores0"]))
    # the plain program ran: nothing reports as pruned
    assert np.all(np.asarray(out["prune0"]) == cfg.n_layers)
    assert np.all(np.asarray(out["prune1"]) == cfg.n_layers)


def test_engaged_prunes_junk_heavy():
    """When the keep rule rejects (almost) everything, engagement must
    keep the full halving schedule (floor = min_bucket) — identical to
    the static-bucket program, preserving the measured junk-heavy
    speedup."""
    import copy

    from nanovs_slam_tpu.matching.width_pruning import engaged_width_forward

    cfg = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=3,
                          num_heads=4)
    model = LightGlue(cfg)
    data = _matchable_pair(256, 256, n_common=16, seed=13)
    params = model.init(jax.random.PRNGKey(3), data, train=True)["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    params = copy.deepcopy(params)
    for i in range(cfg.n_layers - 1):
        # matchability ~ sigmoid(-20) ~ 0 -> keep rule fails;
        # token confidence ~ sigmoid(+20) ~ 1 > threshold -> the
        # low-confidence protection doesn't fire either
        params[f"log_assignment_{i}"]["matchability"]["bias"] = \
            params[f"log_assignment_{i}"]["matchability"]["bias"] - 20.0
        params[f"token_confidence_{i}"]["token"]["bias"] = \
            params[f"token_confidence_{i}"]["token"]["bias"] + 20.0

    out = engaged_width_forward(model, params, data,
                                width_confidence=0.99, min_bucket=64)
    ref = width_pruned_forward(model, params, data, 0.99, None, 64,
                               None, 64, 64)
    np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                  np.asarray(ref["matches0"]))
    np.testing.assert_array_equal(np.asarray(out["prune0"]),
                                  np.asarray(ref["prune0"]))
    # pruning actually engaged (256 -> 128 -> 64 buckets)
    assert (np.asarray(out["prune0"])[0] < cfg.n_layers).sum() >= 128


def test_inference_forward_dispatch():
    """inference_forward honors cfg.width_confidence — the reference's
    automatic-engagement semantics (lightglue.py:613-624): >0 runs the
    width-pruned program (prune0/prune1 present), <=0 the plain forward.
    In the exactness regime (all valid points keep-flagged and within
    the final bucket) the two must agree on matches."""
    import dataclasses

    from nanovs_slam_tpu.matching.lightglue import inference_forward

    base = LightGlueConfig(input_dim=32, descriptor_dim=32, n_layers=3,
                           num_heads=4)
    data = _matchable_pair(256, 256, n_common=40, seed=3)
    mask = np.zeros((1, 256), bool)
    mask[0, :100] = True  # 100 valid <= min_bucket 128 -> exact regime
    data["mask0"] = jnp.asarray(mask)
    data["mask1"] = jnp.asarray(mask)
    model = LightGlue(base)
    params = model.init(jax.random.PRNGKey(0), data, train=True)["params"]

    pred_plain = inference_forward(model, params, data)
    assert "prune0" not in pred_plain

    pruned_model = LightGlue(
        dataclasses.replace(base, width_confidence=1.0))
    pred_pruned = inference_forward(pruned_model, params, data)
    assert "prune0" in pred_pruned
    np.testing.assert_array_equal(np.asarray(pred_plain["matches0"]),
                                  np.asarray(pred_pruned["matches0"]))
