"""Multi-host helpers (single-process degenerate case on the 8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.parallel.distributed import (
    global_mesh, host_local_batch_to_global, initialize,
    process_local_batch_size)


def test_initialize_single_process_noop():
    initialize()  # must not raise or try to rendezvous
    assert jax.process_count() == 1


def test_global_mesh_and_batch_assembly():
    mesh = global_mesh(("data",))
    assert mesh.devices.size == 8
    batch = {"image": np.random.rand(16, 8, 8, 3).astype(np.float32),
             "label": np.arange(16, dtype=np.int32)}
    g = host_local_batch_to_global(mesh, batch)
    assert g["image"].shape == (16, 8, 8, 3)
    # really sharded over the data axis, not replicated
    assert len(g["image"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["label"]), batch["label"])

    # a jitted reduction over the global array works (psum inserted by XLA)
    total = jax.jit(lambda x: jnp.sum(x))(g["image"])
    np.testing.assert_allclose(float(total), batch["image"].sum(), rtol=1e-5)


def test_process_local_batch_size():
    assert process_local_batch_size(64) == 64  # one process here
