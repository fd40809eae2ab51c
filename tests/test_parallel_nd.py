"""N-D parallelism: spatial partitioning (SP) + tensor parallelism (TP).

Runs on the 8-virtual-CPU-device mesh (conftest). Each test asserts BOTH
numerical agreement with the unsharded program AND that the compiled HLO
actually contains cross-device collectives — i.e. the partitioner really
split the work, rather than silently replicating it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.parallel.mesh import make_mesh
from nanovs_slam_tpu.parallel.spatial import (spatial_forward,
                                              spatial_train_step)
from nanovs_slam_tpu.parallel.tp import (lightglue_param_specs,
                                         tp_lightglue_forward)

pytestmark = pytest.mark.slow


def _compiled_text(lowered) -> str:
    return lowered.compile().as_text()


def _has_collective(text: str) -> bool:
    return any(op in text for op in
               ("all-reduce", "collective-permute", "all-gather",
                "reduce-scatter", "all-to-all"))


@pytest.fixture(scope="module")
def kp2d_setup():
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model

    H = W = 64
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     (1, H, W, 3))
    variables = {"params": params, "batch_stats": batch_stats}
    return cfg, model, variables, H, W


def test_spatial_forward_matches_single_device(kp2d_setup):
    cfg, model, variables, H, W = kp2d_setup
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3), jnp.float32)

    def apply_fn(v, img):
        return model.apply(v, img, False)

    run = spatial_forward(mesh, apply_fn, variables, batch_axis="data",
                          spatial_axis="model")
    sharded = run(x)
    single = apply_fn(variables, x)
    for k in single:
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(single[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
    # conv halo exchange / psum must appear: the image really was split
    assert _has_collective(_compiled_text(run.lowered(x)))


def test_spatial_forward_latency_mode_single_image(kp2d_setup):
    """The latency-bound case: ONE image, all 8 devices on its height."""
    cfg, model, variables, H, W = kp2d_setup
    mesh = make_mesh(8, axis_names=("model",))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32)

    def apply_fn(v, img):
        return model.apply(v, img, False)

    run = spatial_forward(mesh, apply_fn, variables, spatial_axis="model")
    out = run(x)
    ref = apply_fn(variables, x)
    np.testing.assert_allclose(np.asarray(out["score"]),
                               np.asarray(ref["score"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["vlad"]),
                               np.asarray(ref["vlad"]),
                               rtol=2e-4, atol=2e-4)


def test_spatial_train_step_matches_dp(kp2d_setup):
    """2-D (data x spatial) training step: same loss as the plain jitted
    step on identical inputs/rng."""
    from nanovs_slam_tpu.data.homography import sample_homography
    from nanovs_slam_tpu.train.multitask_loss import LossWeights
    from nanovs_slam_tpu.train.train_step import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step)

    H = W = 48
    from nanovs_slam_tpu.configs import get_config
    from nanovs_slam_tpu.models.kp2dtiny import build_model

    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    tx = make_optimizer("adam", 1e-3)
    state, io_net = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       (1, H, W, 3), tx, with_io=True,
                                       io_top_k=16)
    step = make_train_step(model, cfg, H, W, io_net=io_net, io_top_k=16,
                           donate=False)

    B = 4
    hs, ws = 2 * (H // cfg.cell), 2 * (W // cfg.cell)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(B, H, W, 3).astype(np.float32) * 2 - 1,
        "image_aug": rs.rand(B, H, W, 3).astype(np.float32) * 2 - 1,
        "seg": rs.randint(0, 7, (B, hs, ws)).astype(np.int32),
        "seg_aug": rs.randint(0, 7, (B, hs, ws)).astype(np.int32),
        "homography": np.stack(
            [sample_homography((H, W), np.random.RandomState(i))
             for i in range(B)]).astype(np.float32),
    }

    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    sp_step = spatial_train_step(mesh, step, batch_axis="data",
                                 spatial_axis="model")
    new_state, metrics = sp_step(state, batch, LossWeights(),
                                 jax.random.PRNGKey(7))
    assert int(new_state.step) == 1
    sp_loss = float(metrics["total_loss"])
    assert np.isfinite(sp_loss)

    _, ref_metrics = step(state, jax.device_put(batch), LossWeights(),
                          jax.random.PRNGKey(7))
    assert np.isclose(sp_loss, float(ref_metrics["total_loss"]),
                      rtol=5e-4, atol=5e-4)


@pytest.fixture(scope="module")
def lightglue_setup():
    from nanovs_slam_tpu.matching.lightglue import (LightGlue,
                                                    LightGlueConfig)

    cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=2,
                          num_heads=4)
    model = LightGlue(cfg)
    B, M, N = 1, 32, 40
    rng = jax.random.PRNGKey(3)
    k0, k1, d0, d1, ki = jax.random.split(rng, 5)
    data = {
        "keypoints0": jax.random.uniform(k0, (B, M, 2), minval=-1.0),
        "keypoints1": jax.random.uniform(k1, (B, N, 2), minval=-1.0),
        "descriptors0": jax.random.normal(d0, (B, M, 64)),
        "descriptors1": jax.random.normal(d1, (B, N, 64)),
        "mask0": jnp.arange(M)[None] < M - 4,
        "mask1": jnp.arange(N)[None] < N - 6,
    }
    # train=True materializes every layer's assignment/confidence heads
    variables = model.init(ki, data, True)
    return model, variables, data


def test_tp_param_specs_shard_attention(lightglue_setup):
    model, variables, data = lightglue_setup
    specs = lightglue_param_specs(variables["params"])
    t0 = specs["transformers_0"]
    assert t0["self_attn"]["Wqkv"]["kernel"] == jax.sharding.PartitionSpec(
        None, "model")
    assert t0["self_attn"]["out_proj"]["kernel"] == \
        jax.sharding.PartitionSpec("model", None)
    assert t0["cross_attn"]["to_qk"]["kernel"] == \
        jax.sharding.PartitionSpec(None, "model")
    # assignment / confidence heads replicated
    assert specs["log_assignment_0"]["final_proj"]["kernel"] == \
        jax.sharding.PartitionSpec()
    assert specs["posenc"]["Wr"] == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("tp_size", [2, 4])
def test_tp_lightglue_matches_replicated(lightglue_setup, tp_size):
    model, variables, data = lightglue_setup
    mesh = make_mesh(8, axis_names=("data", "model"),
                     shape=(8 // tp_size, tp_size))
    run = tp_lightglue_forward(mesh, model, variables)
    tp_out = run(data)
    ref = model.apply(variables, data)
    np.testing.assert_array_equal(np.asarray(tp_out["matches0"]),
                                  np.asarray(ref["matches0"]))
    np.testing.assert_allclose(np.asarray(tp_out["log_assignment"]),
                               np.asarray(ref["log_assignment"]),
                               rtol=2e-4, atol=2e-4)
    assert _has_collective(_compiled_text(run.lowered(data)))
