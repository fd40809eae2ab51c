"""Conv+BN folding test: folded model must produce identical eval outputs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.models.kp2dtiny import build_model
from nanovs_slam_tpu.utils.fuse import fold_batchnorm


@pytest.mark.slow
def test_fold_batchnorm_output_parity():
    cfg = get_config("N", n_classes=7)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 48, 64, 3))
    variables = model.init({"params": rng, "dropout": rng}, x0, True)
    # make batch stats non-trivial by running a train step
    _, mut = model.apply(variables, x0, True, rngs={"dropout": rng},
                         mutable=["batch_stats"])
    params = variables["params"]
    batch_stats = mut["batch_stats"]

    ref = model.apply({"params": params, "batch_stats": batch_stats},
                      x0, False)
    fparams, fstats = fold_batchnorm(params, batch_stats)
    out = model.apply({"params": fparams, "batch_stats": fstats}, x0, False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-5, err_msg=k)
