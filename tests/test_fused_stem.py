"""Fused stem Pallas kernel (ops/pallas/fused_stem.py) — parity.

The kernel is a documented NEGATIVE RESULT for performance (see its
module docstring and STATUS.md) but is kept numerically exact; this
test pins that exactness so the artifact stays honest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovs_slam_tpu.ops.pallas.fused_stem import fused_stem_pair_pool

pytestmark = pytest.mark.slow


def _xla_ref(x, w1, b1, w2, b2):
    from flax import linen as nn

    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=dn) + b1
    y = jnp.where(y > 0, y, 0.01 * y)
    y = jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME",
                                     dimension_numbers=dn) + b2
    y = jnp.where(y > 0, y, 0.01 * y)
    return nn.max_pool(y, (2, 2), (2, 2))


@pytest.mark.parametrize("shape,c1,c2", [((2, 48, 64), 16, 24),
                                         ((1, 32, 48), 16, 32)])
def test_fused_stem_parity(shape, c1, c2):
    rs = np.random.RandomState(0)
    B, H, W = shape
    x = jnp.asarray(rs.randn(B, H, W, 3).astype(np.float32))
    w1 = jnp.asarray(rs.randn(3, 3, 3, c1).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rs.randn(c1).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(3, 3, c1, c2).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rs.randn(c2).astype(np.float32) * 0.1)
    got = fused_stem_pair_pool(x, w1, b1, w2, b2, interpret=True)
    want = _xla_ref(x, w1, b1, w2, b2)
    assert got.shape == want.shape == (B, H // 2, W // 2, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
