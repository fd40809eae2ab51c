"""Checkpoint save/restore + partial-restore filtering + optimizer mask."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model
from nanovs_slam_tpu.utils.checkpoint import (filter_params, load_checkpoint,
                                              merge_params, save_checkpoint)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, 48, 64, 3))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": params, "batch_stats": bs},
                    config={"foo": 1}, epoch=3, results={"iou": 0.5})
    tree, meta = load_checkpoint(path)
    assert meta["epoch"] == 3 and meta["results"]["iou"] == 0.5
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(tree["params"])
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_npz_pinned_checkpoint_roundtrip(tmp_path):
    """Pinned .npz checkpoints (tools/pin_checkpoint.py; VERDICT r4 #3):
    save_npz_checkpoint -> load_checkpoint must be exact, dispatch on
    the .npz file path, and preserve meta."""
    from nanovs_slam_tpu.utils.checkpoint import save_npz_checkpoint

    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(1), (1, 48, 64, 3))
    path = save_npz_checkpoint(str(tmp_path / "pin"),
                               {"params": params, "batch_stats": bs},
                               meta={"epoch": 9, "config": {"name": "N"}})
    assert path.endswith(".npz")
    tree, meta = load_checkpoint(path)
    assert meta["epoch"] == 9 and meta["config"]["name"] == "N"
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(tree["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert set(tree) == {"params", "batch_stats"}


def test_filter_and_merge_partial_restore():
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    params, _ = init_model(model, jax.random.PRNGKey(0), (1, 48, 64, 3))

    filtered = filter_params(params, "seg_last")
    assert "convs_8" not in filtered["seg_head"]
    assert "convs_7" in filtered["seg_head"]

    # restore into a 13-class fresh init: seg final conv keeps fresh init
    cfg13 = get_config("N", n_classes=13)
    fresh, _ = init_model(build_model(cfg13), jax.random.PRNGKey(1),
                          (1, 48, 64, 3))
    merged = merge_params(fresh, filtered)
    assert merged["seg_head"]["convs_8"]["kernel"].shape[-1] == 13
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["conv1a"]["conv"]["kernel"]),
        np.asarray(params["backbone"]["conv1a"]["conv"]["kernel"]))

    assert "seg_head" not in filter_params(params, "seg")
    assert "vlad_head" not in filter_params(params, "vlad")


def test_freeze_backbone_optimizer():
    import optax

    from nanovs_slam_tpu.train.train_step import make_optimizer

    tx = make_optimizer("adam", 1e-3, freeze_backbone=True)
    params = {"model": {"backbone": {"w": jnp.ones(3)},
                        "head": {"w": jnp.ones(3)}},
              "io": {}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["model"]["backbone"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["model"]["head"]["w"]).sum()) > 0.0
