"""InlierNet parity vs the reference torch implementation."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.models.inlier_net import InlierNet
from nanovs_slam_tpu.utils.torch_import import convert_inlier_net_state_dict

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not available")
if REF not in sys.path:
    sys.path.insert(0, REF)


def test_inlier_net_parity():
    from kp2dtiny.models.inlier_net import InlierNet as TorchInlierNet

    torch.manual_seed(0)
    tnet = TorchInlierNet(blocks=4).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, batch_stats = convert_inlier_net_state_dict(sd)

    rs = np.random.RandomState(0)
    pp = rs.randn(2, 64, 5).astype(np.float32)
    with torch.no_grad():
        # torch input layout (B, 5, N, 1)
        t_out = tnet(torch.from_numpy(
            pp.transpose(0, 2, 1)[..., None])).squeeze(-1).squeeze(1).numpy()

    jnet = InlierNet(blocks=4)
    j_out = jnet.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(pp), False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4)
