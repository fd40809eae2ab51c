"""Sharded eval fan-out over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.inference import make_infer_fn
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.parallel.eval_fanout import map_batched, sharded_infer_fn
from nanovs_slam_tpu.parallel.mesh import make_mesh


def test_sharded_eval_matches_single_device():
    H, W = 48, 64
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    variables = {"params": params, "batch_stats": bs}
    infer = make_infer_fn(model, cfg, H, W)

    rs = np.random.RandomState(0)
    items = [rs.rand(H, W, 3).astype(np.float32) * 2 - 1 for _ in range(11)]

    mesh = make_mesh(8)
    run = sharded_infer_fn(infer, variables, mesh)
    sharded = map_batched(run, items, batch_size=8)
    assert sum(r["score"].shape[0] for r in sharded) == 11

    single = infer(variables, jnp.asarray(np.stack(items[:3])))
    np.testing.assert_allclose(sharded[0]["vlad"][:3],
                               np.asarray(single["vlad"]), atol=1e-5)
