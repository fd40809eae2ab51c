"""Multi-host (multi-process) execution helpers.

The reference is strictly single-process (SURVEY.md §2.8). On TPU pods,
scaling past one host means one JAX process per host, each seeing only its
local chips, with XLA collectives spanning the pod via ICI. Three pieces
make the training stack multi-host-ready:

1. initialize(): jax.distributed bring-up (coordinator rendezvous). On a
   single host this is a no-op, so every entry point can call it
   unconditionally.
2. global_mesh(): a Mesh over ALL processes' devices (jax.devices() is
   global after initialize()).
3. host_local_batch_to_global(): each host loads ITS OWN batch shard
   (data pipeline stays embarrassingly parallel) and assembles a global
   jax.Array without any cross-host gather — the standard
   make_array_from_process_local_data multi-host input pipeline.

Single-process tests exercise 3 on the 8-virtual-device CPU mesh (the
API is identical; process_count==1 just means the local shard is the
whole batch). Real pod runs are outside this environment (one chip via
tunnel); the code paths are the documented jax.distributed recipe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pod_env_detected() -> bool:
    """True when a MULTI-process cluster launcher env is present, in which
    case jax.distributed.initialize() can auto-detect all three arguments
    (GKE/Cloud-TPU pod, SLURM, Open MPI). Single-worker markers (e.g. the
    one-hostname TPU_WORKER_HOSTNAMES a tunneled single chip sets) do NOT
    count — auto-init with no coordinator would raise."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hosts:
        return True  # real pod: >1 worker hostname
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:  # empty/garbage leftovers are not a pod
            pass
    return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed when running multi-process; no-op when
    single-process (nothing to rendezvous) or already initialized.

    Triggering requires either an explicit coordinator_address /
    num_processes>1, or a recognized cluster launcher environment
    (_pod_env_detected) — in the latter case all three arguments are
    auto-detected by JAX and may be left None. A bare single-process run
    (no args, no pod env) is a no-op.
    """
    if (num_processes in (None, 1) and coordinator_address is None
            and not _pod_env_detected()):
        return  # single-process run
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh(axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over every device of every process (call after initialize())."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    return Mesh(np.array(devices).reshape(shape), axis_names=axis_names)


def host_local_batch_to_global(mesh: Mesh, batch,
                               batch_axis: str = "data"):
    """Assemble per-host batch shards into global batch-sharded jax.Arrays.

    Each process passes ONLY its local slice (global_batch /
    process_count samples); the returned arrays are globally sharded over
    batch_axis with no cross-host data movement. With one process this
    degenerates to shard_batch (the local slice IS the global batch).
    """
    sharding = NamedSharding(mesh, P(batch_axis))

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(to_global, batch)


def process_local_batch_size(global_batch_size: int) -> int:
    """How many samples THIS host's data loader should produce per step."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
