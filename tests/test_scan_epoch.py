"""Epoch-as-one-XLA-program (train/scan_epoch.py) equivalence tests.

The scan path must be a pure dispatch-cost optimization: consuming the
same indices/homographies/PRNG keys as the step-at-a-time loop, it must
produce the same parameters. DeviceCachedPairLoader.epoch_arrays draws
from the same host RandomState stream in the same order as .epoch(), so
loop and scan epochs see bitwise-identical inputs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nanovs_slam_tpu.configs import get_config  # noqa: E402
from nanovs_slam_tpu.data.device_cache import DeviceCachedPairLoader  # noqa: E402
from nanovs_slam_tpu.models.kp2dtiny import build_model  # noqa: E402
from nanovs_slam_tpu.train.multitask_loss import default_loss_weights  # noqa: E402
from nanovs_slam_tpu.train.scan_epoch import (make_epoch_fn,  # noqa: E402
                                              weights_as_arrays)
from nanovs_slam_tpu.train.train_step import (create_train_state,  # noqa: E402
                                              make_optimizer,
                                              make_train_step)

H, W = 48, 64


class _TinyDataset:
    def __init__(self, n=8, seed=0):
        rs = np.random.RandomState(seed)
        self.items = [
            {"image": rs.rand(H, W, 3).astype(np.float32),
             "seg": rs.randint(0, 4, (H, W)).astype(np.int32)}
            for _ in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _setup(scan: bool):
    cfg = get_config("N", n_classes=4)
    model = build_model(cfg)
    # sgd, not adam: adam divides by sqrt(v)+eps, which amplifies
    # ulp-level fusion differences on near-zero-gradient params to
    # lr-scale — sgd keeps param deltas proportional to the (tiny)
    # gradient difference, so the equivalence bound can stay tight
    tx = make_optimizer("sgd", lr=1e-3)
    # with_io=False keeps the CPU compile tractable for the fast tier; the
    # IO-enabled scan path is exercised by the slow CLI smoke below
    state, io_net = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (1, H, W, 3), tx,
        with_io=False)
    step = make_train_step(model, cfg, H, W, io_net=None,
                           donate=False, jit_compile=not scan)
    return state, step


def test_scan_epoch_equals_loop():
    """One scanned epoch == the step-at-a-time loop, same inputs, same
    final params (to f32 noise) and same per-step losses."""
    loader = DeviceCachedPairLoader(_TinyDataset(), 4, H, W, d_f=2,
                                    train=True, seed=3)
    weights = default_loss_weights()
    epoch_rng = jax.random.fold_in(jax.random.PRNGKey(7), 0)

    # loop path (the production default)
    state_l, step_l = _setup(scan=False)
    losses_loop = []
    for i, batch in enumerate(loader.epoch(0)):
        state_l, metrics = step_l(state_l, batch, weights,
                                  jax.random.fold_in(epoch_rng, i))
        losses_loop.append(float(metrics["total_loss"]))

    # scan path, same epoch index -> same RandomState draws
    state_s, step_body = _setup(scan=True)
    epoch_fn = make_epoch_fn(step_body, d_f=2, with_depth=False,
                             augment=True)
    idx_all, homos_all, assemble_rng = loader.epoch_arrays(0)
    state_s, metrics_stack = epoch_fn(state_s, loader.cache_arrays(),
                                      idx_all, homos_all,
                                      weights_as_arrays(weights),
                                      assemble_rng, epoch_rng)

    losses_scan = [float(v) for v in metrics_stack["total_loss"]]
    assert len(losses_scan) == len(losses_loop) == len(loader)
    np.testing.assert_allclose(losses_scan, losses_loop, rtol=1e-5,
                               atol=1e-6)

    # params: the scan and loop programs fuse differently, so bitwise
    # equality is not guaranteed, but with sgd the parameter delta is
    # proportional to the (ulp-level) gradient difference
    flat_l = jax.tree_util.tree_leaves(state_l.params)
    flat_s = jax.tree_util.tree_leaves(state_s.params)
    for a, b in zip(flat_l, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert int(state_s.step) == int(state_l.step)


def test_epoch_arrays_matches_epoch_stream():
    """epoch_arrays' indices/homographies == the ones .epoch() feeds
    _assemble (same RandomState draw order)."""
    loader = DeviceCachedPairLoader(_TinyDataset(), 4, H, W, d_f=2,
                                    train=True, seed=11)
    idx_all, homos_all, _ = loader.epoch_arrays(2)

    # re-draw by hand following epoch()'s order
    from nanovs_slam_tpu.data.homography import sample_homography
    rs = np.random.RandomState(loader.seed + 2)
    order = rs.permutation(loader.n)
    for s in range(len(loader)):
        idx = order[s * 4:(s + 1) * 4]
        np.testing.assert_array_equal(np.asarray(idx_all[s]), idx)
        homos = np.stack([sample_homography((H, W), rs) for _ in range(4)])
        np.testing.assert_allclose(np.asarray(homos_all[s]), homos)


@pytest.mark.slow
def test_scan_epoch_trainer_cli_smoke(tmp_path):
    """--scan_epoch end-to-end through the trainer CLI (2 epochs,
    synthetic): exercises flag wiring, logging cadence and checkpointing."""
    import subprocess
    import sys

    out = tmp_path / "ck"
    r = subprocess.run(
        [sys.executable, "train_multitask.py", "--dataset_name", "synthetic",
         "--config", "N", "--n_epochs", "2", "--synthetic_items", "8",
         "--batch_size", "4", "--device_cache", "--scan_epoch",
         "--no_eval", "--out_model_path", str(out)],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()


def test_scan_epoch_sharded_equals_single():
    """shard_epoch_inputs + the SAME epoch_fn over a 4-device dp mesh ==
    the single-device scan: GSPMD partitions the scanned program from
    operand shardings alone (batch dim of idx/homos sharded, state+cache
    replicated), so losses and final params must match."""
    from nanovs_slam_tpu.parallel.mesh import make_mesh
    from nanovs_slam_tpu.train.scan_epoch import shard_epoch_inputs

    loader = DeviceCachedPairLoader(_TinyDataset(), 4, H, W, d_f=2,
                                    train=True, seed=5)
    weights = weights_as_arrays(default_loss_weights())
    epoch_rng = jax.random.fold_in(jax.random.PRNGKey(9), 0)
    idx_all, homos_all, assemble_rng = loader.epoch_arrays(0)

    state_1, step_body = _setup(scan=True)
    epoch_fn = make_epoch_fn(step_body, d_f=2, with_depth=False,
                             augment=True)
    state_1, stack_1 = epoch_fn(state_1, loader.cache_arrays(),
                                idx_all, homos_all, weights,
                                assemble_rng, epoch_rng)

    mesh = make_mesh(4)
    state_m, _ = _setup(scan=True)
    state_m, cache, idx_s, homos_s = shard_epoch_inputs(
        mesh, state_m, loader.cache_arrays(), idx_all, homos_all)
    state_m, stack_m = epoch_fn(state_m, cache, idx_s, homos_s,
                                weights, assemble_rng, epoch_rng)

    np.testing.assert_allclose(np.asarray(stack_m["total_loss"]),
                               np.asarray(stack_1["total_loss"]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # the compiled epoch program must actually be partitioned: the
    # assembled per-device batch slice is B/4
    with pytest.raises(ValueError, match="not divisible"):
        shard_epoch_inputs(make_mesh(8), state_m, cache,
                           idx_all[:, :6], homos_all[:, :6])
