"""InlierNet parity vs the reference torch implementation."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.models.inlier_net import InlierNet

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not available")
if REF not in sys.path:
    sys.path.insert(0, REF)


def convert_inlier_net(sd):
    """torch InlierNet state_dict -> flax params (models/inlier_net.py)."""
    def dense(w):  # (out, in, 1, 1) -> (in, out)
        return np.asarray(w)[:, :, 0, 0].T.astype(np.float32)

    p = {
        "p_in_conv": {"kernel": dense(sd["p_in.0.weight"])},
        "p_in_bn": {"scale": np.asarray(sd["p_in.1.weight"]),
                    "bias": np.asarray(sd["p_in.1.bias"])},
        "p_out": {"kernel": dense(sd["p_out.weight"]),
                  "bias": np.asarray(sd["p_out.bias"])},
    }
    bs = {
        "p_in_bn": {"mean": np.asarray(sd["p_in.1.running_mean"]),
                    "var": np.asarray(sd["p_in.1.running_var"])},
    }
    for i in range(4):
        p[f"b{i}_conv0"] = {"kernel": dense(sd[f"{i}s0.weight"]),
                            "bias": np.asarray(sd[f"{i}s0.bias"])}
        p[f"b{i}_bn0"] = {"scale": np.asarray(sd[f"{i}s1.weight"]),
                          "bias": np.asarray(sd[f"{i}s1.bias"])}
        p[f"b{i}_conv1"] = {"kernel": dense(sd[f"{i}s2.weight"]),
                            "bias": np.asarray(sd[f"{i}s2.bias"])}
        p[f"b{i}_bn1"] = {"scale": np.asarray(sd[f"{i}s3.weight"]),
                          "bias": np.asarray(sd[f"{i}s3.bias"])}
        bs[f"b{i}_bn0"] = {"mean": np.asarray(sd[f"{i}s1.running_mean"]),
                           "var": np.asarray(sd[f"{i}s1.running_var"])}
        bs[f"b{i}_bn1"] = {"mean": np.asarray(sd[f"{i}s3.running_mean"]),
                           "var": np.asarray(sd[f"{i}s3.running_var"])}
    return p, bs


def test_inlier_net_parity():
    from kp2dtiny.models.inlier_net import InlierNet as TorchInlierNet

    torch.manual_seed(0)
    tnet = TorchInlierNet(blocks=4).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, batch_stats = convert_inlier_net(sd)

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
