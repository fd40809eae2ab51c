"""descriptor_loss learning-direction checks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nanovs_slam_tpu.losses.keypoint import descriptor_loss
from nanovs_slam_tpu.ops.grid import decode_coords


def _setup(Hc=8, Wc=10, C=16, seed=0):
    rs = np.random.RandomState(seed)
    H, W = Hc * 4, Wc * 4
    shift = jnp.zeros((1, Hc, Wc, 2))
    coord = decode_coords(shift, H, W, 4)
    uv_norm = jnp.stack([coord[..., 0] / ((W - 1) / 2) - 1,
                         coord[..., 1] / ((H - 1) / 2) - 1], axis=-1)
    target = rs.randn(1, 2 * Hc, 2 * Wc, C).astype(np.float32)
    return H, W, coord, uv_norm, jnp.asarray(target)


def test_random_descriptors_already_satisfy_margin():
    """Exact positives + far negatives -> zero loss (sanity: the triplet
    does not penalize an already-correct configuration)."""
    H, W, coord, uv_norm, target = _setup()
    l, recall = descriptor_loss(target, target, uv_norm, uv_norm, coord,
                                relax_field=4)
    assert float(l) == 0.0
    assert float(recall) > 0.9


def test_learning_source_map_raises_recall():
    """A learnable source map trained against a fixed target under the
    identity warp must reach near-perfect nearest-neighbor recall."""
    H, W, coord, uv_norm, target = _setup()
    rs = np.random.RandomState(1)
    source = jnp.asarray(rs.randn(*target.shape).astype(np.float32))

    def loss_fn(src):
        l, recall = descriptor_loss(src, target, uv_norm, uv_norm, coord,
                                    relax_field=4)
        return l, recall

    _, r0 = loss_fn(source)
    tx = optax.adam(3e-2)
    opt = tx.init(source)
    grad_fn = jax.jit(jax.value_and_grad(lambda s: loss_fn(s)[0]))
    for _ in range(150):
        l, g = grad_fn(source)
        updates, opt = tx.update(g, opt, source)
        source = optax.apply_updates(source, updates)
    l1, r1 = loss_fn(source)
    assert float(r1) > 0.9, (float(r0), float(r1))
    assert float(l1) < 0.05
