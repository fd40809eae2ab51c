"""Worker for the REAL multi-process jax.distributed test
(tests/test_multiprocess_distributed.py). Launched as a plain script:

    python _dist_worker.py <process_id> <num_processes> <port> <batch.npz> \
        <out.json>

Each process sees 4 virtual CPU devices (global mesh = 8 over 2
processes), loads ITS OWN half of the global batch
(parallel/distributed.process_local_batch_size slice), assembles the
global batch with host_local_batch_to_global, and runs ONE dp train step
of the real KP2Dtiny model. The parent compares the loss against the
single-process 8-device run.
"""

import json
import os
import sys

pid, nproc, port, batch_path, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                          sys.argv[3], sys.argv[4],
                                          sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Bring-up FIRST, before any backend-initializing call (the ordering the
# ADVICE r2 medium finding is about).
from nanovs_slam_tpu.parallel.distributed import (  # noqa: E402
    host_local_batch_to_global, initialize, process_local_batch_size)

initialize(coordinator_address=f"localhost:{port}", num_processes=nproc,
           process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

import numpy as np  # noqa: E402

from nanovs_slam_tpu.configs import get_config  # noqa: E402
from nanovs_slam_tpu.models.kp2dtiny import build_model  # noqa: E402
from nanovs_slam_tpu.parallel.distributed import global_mesh  # noqa: E402
from nanovs_slam_tpu.parallel.mesh import replicate  # noqa: E402
from nanovs_slam_tpu.train.schedules import (DEFAULT_LOSS_WEIGHTS,  # noqa: E402
                                             )
from nanovs_slam_tpu.train.train_step import (create_train_state,  # noqa: E402
                                              make_optimizer,
                                              make_train_step)

raw = dict(np.load(batch_path))
B, H, W = raw["image"].shape[:3]

cfg = get_config("N", v3=False, n_classes=8)
model = build_model(cfg)
tx = make_optimizer("adam", lr=1e-3)
state, io_net = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, H, W, 3), tx, with_io=False)

mesh = global_mesh(("data",))
state = replicate(mesh, state)

# THIS process's slice of the global batch
local_bs = process_local_batch_size(B)
lo = pid * local_bs
local = {k: v[lo: lo + local_bs] for k, v in raw.items()}
batch = host_local_batch_to_global(mesh, local)

flags = {"keypoints": True, "segmentation": True, "visloc": True,
         "depth": False}
step_fn = make_train_step(model, cfg, H, W, io_net=io_net,
                          train_flags=flags, donate=False)
state2, metrics = step_fn(state, batch, DEFAULT_LOSS_WEIGHTS,
                          jax.random.PRNGKey(42))
loss = float(metrics["total_loss"])

# a second step proves optimizer/batch-stat updates stay consistent
batch2 = host_local_batch_to_global(mesh, local)
_, metrics2 = step_fn(state2, batch2, DEFAULT_LOSS_WEIGHTS,
                      jax.random.PRNGKey(43))

with open(out_path, "w") as f:
    json.dump({"pid": pid, "loss": loss,
               "loss2": float(metrics2["total_loss"]),
               "process_count": jax.process_count(),
               "device_count": jax.device_count()}, f)
print(f"proc{pid}: loss={loss:.6f} loss2={float(metrics2['total_loss']):.6f}",
      flush=True)
