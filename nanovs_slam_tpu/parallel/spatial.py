"""Spatial partitioning (SP) of the conv stack over image height.

For latency-bound inference (one high-resolution frame, the VO frontend
regime) data parallelism cannot help — there is only one image. The
TPU-native answer is to shard the IMAGE ITSELF over devices: annotate the
input NHWC array with a height sharding and let XLA's SPMD partitioner
split every convolution spatially, inserting the halo exchanges
(collective-permutes of the kernel-overlap rows between height-adjacent
devices) automatically. This is the "annotate shardings, let XLA insert
collectives" recipe — no manual shard_map/ppermute stencil code to
maintain, and the partitioner fuses halo exchange with the surrounding
convs.

No reference counterpart (the reference is single-GPU, SURVEY.md §2.8);
this layer exists because the build target is multi-chip TPU serving.

Numerics note: global reductions (the VLAD head's softmax-sum over all
spatial positions) become cross-device psums; results match the
single-device program to float tolerance and are asserted equal in
tests/test_parallel_nd.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def image_sharding(mesh: Mesh, batch_axis: Optional[str] = None,
                   spatial_axis: str = "model") -> NamedSharding:
    """NHWC sharding: batch over batch_axis (if given), height over
    spatial_axis. Height is the right split for row-major NHWC layouts:
    W and C stay contiguous per device, so halo rows are dense slabs."""
    return NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))


def spatial_forward(mesh: Mesh, apply_fn: Callable[..., Any],
                    variables: Dict, *, batch_axis: Optional[str] = None,
                    spatial_axis: str = "model",
                    donate: bool = False) -> Callable:
    """jit apply_fn(variables, images, ...) with images height-sharded and
    params replicated; outputs are gathered to replicated form (callers
    immediately post-process the full tensor).

    apply_fn is any function (variables, images) -> pytree built from
    convs/pools/reductions; GSPMD partitions it end-to-end.
    """
    rep = NamedSharding(mesh, P())
    in_sh = image_sharding(mesh, batch_axis, spatial_axis)

    jitted = jax.jit(apply_fn,
                     in_shardings=(rep, in_sh),
                     out_shardings=rep,
                     donate_argnums=(1,) if donate else ())

    def run(images):
        images = jax.device_put(images, in_sh)
        return jitted(variables, images)

    # variables captured replicated once, not re-transferred per call
    variables = jax.device_put(variables, rep)
    run.lowered = lambda images: jitted.lower(
        variables, jax.device_put(images, in_sh))
    return run


def spatial_train_step(mesh: Mesh, step_fn: Callable,
                       batch_axis: str = "data",
                       spatial_axis: str = "model") -> Callable:
    """Wrap a (state, batch, ...) train step so image-like leaves (rank-4
    NHWC) shard over (batch, height) and everything else over batch only.
    2-D scaling: data parallelism for throughput x spatial partitioning
    for per-sample memory (high-res inputs whose activations exceed one
    core's HBM slice).
    """
    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))
    bat_sh = NamedSharding(mesh, P(batch_axis))

    def place_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, img_sh if getattr(x, "ndim", 0) == 4 else bat_sh), batch)

    jitted = jax.jit(step_fn)

    def run(state, batch, *args):
        state = jax.device_put(state, rep)
        return jitted(state, place_batch(batch), *args)

    return run
