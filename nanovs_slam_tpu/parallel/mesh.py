"""Device mesh + sharding helpers (L-comm layer).

The reference is single-process single-device (SURVEY.md §2.8); on TPU the
natural scaling axis for these ~1M-param models is DATA parallelism:
a 1-D mesh with the batch sharded over the "data" axis, parameters
replicated, and gradient reduction left to XLA (pjit inserts the psum over
ICI automatically from the sharding annotations). Two further axes exist
for latency-bound (not throughput-bound) regimes:
- SPATIAL partitioning of the conv stack over image height
  (parallel/spatial.py) — GSPMD inserts the conv halo exchanges;
- TENSOR parallelism over LightGlue attention heads (parallel/tp.py).
Expert parallelism is N/A (no MoE anywhere in the reference's model zoo);
pipeline parallelism is strictly dominated by data parallelism at <1M
params (the whole model fits in one core's VMEM).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first n_devices devices.

    1-D data-parallel by default; pass axis_names + shape for N-D meshes
    (e.g. axis_names=("data", "model"), shape=(4, 2)). Contiguous device
    order keeps the fastest-varying (last) axis on neighboring chips, so
    the chattiest collectives (TP/SP) ride the shortest ICI hops."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    return Mesh(np.array(devices).reshape(shape), axis_names=axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
