"""Batched inference fan-out across the device mesh.

The reference evaluates on one device; on TPU the eval suites (HPatches
pairs, Pittsburgh full-set descriptor extraction, dense seg eval) fan the
batch axis over the data mesh: params stay replicated, inputs are
batch-sharded, XLA partitions the program — linear throughput in chips
with zero code change in the metric tail.
"""

from __future__ import annotations

from typing import Callable, Iterable, List

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, replicate, replicated_sharding


def sharded_infer_fn(infer, variables, mesh=None):
    """Wrap infer(variables, images) so images are sharded over the mesh
    batch axis and params replicated."""
    mesh = mesh or make_mesh()
    variables = replicate(mesh, variables)
    bs = batch_sharding(mesh)

    def run(images):
        images = jax.device_put(images, bs)
        return infer(variables, images)

    return run


def map_batched(run: Callable, items: Iterable[np.ndarray],
                batch_size: int) -> List:
    """Drive a sharded infer over an item stream with fixed-size padded
    batches (constant shapes -> one compilation)."""
    out: List = []
    buf: List[np.ndarray] = []

    def flush():
        nonlocal buf
        if not buf:
            return
        n = len(buf)
        while len(buf) < batch_size:
            buf.append(np.zeros_like(buf[0]))
        res = run(np.stack(buf))
        res = jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], res)
        out.append(res)
        buf = []

    for item in items:
        buf.append(np.asarray(item))
        if len(buf) == batch_size:
            flush()
    flush()
    return out
