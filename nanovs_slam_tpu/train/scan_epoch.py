"""Whole-epoch training as ONE XLA program (lax.scan over the step body).

The reference dispatches one optimizer step per Python-loop iteration
(train_multitask.py:510-525); our step-at-a-time path does the same with
a jitted step. On a remote/tunneled TPU every dispatch pays a host->device
round trip, and even locally the per-step launch overhead bounds small-
model step rates. With the dataset HBM-resident (data/device_cache.py)
nothing per-step needs the host at all: this module scans the train step
over the whole epoch — batch assembly (index gather + photometric aug +
homography-pair warp) AND the optimizer step run inside one program, and
the host uploads only the epoch's (S, B) sample indices + (S, B, 3, 3)
homographies and fetches one stacked metrics pytree at the end.

The scanned epoch consumes bitwise-identical inputs to the loop path:
DeviceCachedPairLoader.epoch_arrays draws indices/homographies from the
same host RandomState stream in the same order, and the per-step aug/step
PRNG keys are the same fold_in(base, step) the loop uses. Loop and scan
therefore match up to compiled-program fusion noise (per-step losses to
1e-5 rel; params within a small fraction of one optimizer step —
tests/test_scan_epoch.py pins both), making the scan a dispatch-cost
optimization, not a training change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.device_cache import _assemble
from .multitask_loss import LossWeights


def make_epoch_fn(step_body, d_f: int, with_depth: bool, augment: bool):
    """step_body: the UNJITTED train step from
    make_train_step(..., jit_compile=False).

    Returns epoch_fn(state, cache, idx_all, homos_all, weights,
                     assemble_rng, step_rng) -> (state, stacked_metrics)
    where cache = (images, segs, depths) from
    DeviceCachedPairLoader.cache_arrays() and idx_all/homos_all/
    assemble_rng come from .epoch_arrays(epoch). weights' fields must be
    jnp scalars (see weights_as_arrays) so epoch-schedule changes do not
    recompile.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, cache, idx_all, homos_all, weights: LossWeights,
                 assemble_rng: jax.Array, step_rng: jax.Array):
        images, segs, depths = cache
        steps = idx_all.shape[0]

        def body(carry, xs):
            st = carry
            idx, homos, i = xs
            batch = _assemble(images, segs, depths, idx, homos,
                              jax.random.fold_in(assemble_rng, i),
                              d_f, with_depth, augment)
            st, metrics = step_body(st, batch, weights,
                                    jax.random.fold_in(step_rng, i))
            return st, metrics

        xs = (idx_all, homos_all, jnp.arange(steps))
        return jax.lax.scan(body, state, xs)

    return epoch_fn


def shard_epoch_inputs(mesh: Mesh, state, cache, idx_all, homos_all):
    """Place one epoch's operands for a DATA-PARALLEL mesh.

    epoch_fn itself is sharding-agnostic — jit partitions the scanned
    program from its operand shardings (GSPMD), exactly like the
    step-at-a-time dp path (parallel/mesh.py): train state and the HBM
    dataset cache are REPLICATED, and the per-step batch dimension of
    the (S, B) indices / (S, B, 3, 3) homographies is SHARDED over the
    mesh's first axis, so each device assembles and forwards only its
    B/n slice while XLA inserts the gradient/metric all-reduces over
    ICI. Whole-epoch multi-chip training therefore stays ONE dispatch
    per epoch. Requires B % mesh_axis_size == 0."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    B = idx_all.shape[1]
    if B % n != 0:
        raise ValueError(f"batch {B} not divisible by mesh axis "
                         f"'{axis}' size {n}")
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(None, axis))
    put = jax.device_put
    state = jax.tree_util.tree_map(lambda x: put(x, rep), state)
    cache = jax.tree_util.tree_map(lambda x: put(x, rep), cache)
    return state, cache, put(idx_all, bsh), put(homos_all, bsh)


def weights_as_arrays(weights: LossWeights) -> LossWeights:
    """Float fields -> traced jnp scalars so a loss-weight schedule change
    at an epoch boundary does not trigger a recompile of the epoch
    program."""
    return LossWeights(*[jnp.asarray(v, jnp.float32) for v in weights])
