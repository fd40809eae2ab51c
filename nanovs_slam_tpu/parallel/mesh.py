"""Device mesh + sharding helpers (L-comm layer).

The reference is single-process single-device (SURVEY.md §2.8); on TPU the
natural scaling axis for these ~1M-param models is DATA parallelism:
a 1-D mesh with the batch sharded over the "data" axis, parameters
replicated, and gradient reduction left to XLA (pjit inserts the psum over
ICI automatically from the sharding annotations). No TP/PP is warranted at
this model scale; the mesh is still N-D-capable for larger KeypointFormer
variants (axis "model" reserved).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices).reshape((len(devices),) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names=axis_names)


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
