"""Round-trip guarantee for utils/torch_export: torch state_dict ->
convert_state_dict -> export_state_dict must be BITWISE identical.

This is the correctness contract that lets checkpoints trained in this
framework run inside the reference torch stack for pipeline-level parity
(VERDICT r2 "Next round" #1)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference not available")]

if REF not in sys.path:
    sys.path.insert(0, REF)

from nanovs_slam_tpu.utils.torch_export import (export_state_dict,  # noqa: E402
                                                load_into_torch_model)
from nanovs_slam_tpu.utils.torch_import import convert_state_dict  # noqa: E402


def _roundtrip(tmodel):
    sd = tmodel.state_dict()
    params, bs = convert_state_dict(sd)
    sd2 = export_state_dict(params, bs, sd)
    assert set(sd2.keys()) == set(sd.keys())
    for k, v in sd.items():
        a = v.detach().cpu().numpy()
        b = np.asarray(sd2[k])
        np.testing.assert_array_equal(
            a.astype(np.float32), b.astype(np.float32), err_msg=k)


@pytest.mark.parametrize("name,v3", [("N", False), ("S", False),
                                     ("N", True)])
def test_roundtrip_kp2dtiny(name, v3):
    import torch
    from kp2dtiny.models.kp2dtiny import KP2DTinyV2, KP2DTinyV3

    from nanovs_slam_tpu.configs import get_config

    cfg = get_config(name, v3=v3, n_classes=8)
    torch.manual_seed(0)
    kw = dict(nClasses=8, nfeatures=cfg.nfeatures,
              channel_dims=list(cfg.channel_dims),
              downsample=cfg.downsample, use_attention=cfg.use_attention,
              leaky_relu=cfg.leaky_relu, num_clusters=cfg.num_clusters,
              encoder_dim=cfg.encoder_dim,
              global_descriptor_method=cfg.global_descriptor_method,
              upscale_method=cfg.upscale_method, depth=False)
    tmodel = (KP2DTinyV3(**kw) if v3 else KP2DTinyV2(**kw)).eval()
    _roundtrip(tmodel)


def test_load_into_torch_model_outputs_match():
    """Export our (converted) weights back into a FRESH torch model and
    check the two torch models produce identical outputs."""
    import torch
    from kp2dtiny.models.kp2dtiny import KP2DTinyV2

    from nanovs_slam_tpu.configs import get_config

    cfg = get_config("N", v3=False, n_classes=8)
    kw = dict(nClasses=8, nfeatures=cfg.nfeatures,
              channel_dims=list(cfg.channel_dims),
              downsample=cfg.downsample, use_attention=cfg.use_attention,
              leaky_relu=cfg.leaky_relu, num_clusters=cfg.num_clusters,
              encoder_dim=cfg.encoder_dim,
              global_descriptor_method=cfg.global_descriptor_method,
              upscale_method=cfg.upscale_method, depth=False)
    torch.manual_seed(1)
    src = KP2DTinyV2(**kw).eval()
    torch.manual_seed(2)
    dst = KP2DTinyV2(**kw).eval()

    params, bs = convert_state_dict(src.state_dict())
    load_into_torch_model(dst, params, bs)

    x = torch.from_numpy(
        (np.random.RandomState(0).rand(1, 3, 64, 96).astype(np.float32)
         * 2 - 1))
    with torch.no_grad():
        o1, o2 = src(x), dst(x)
    for k in o1:
        np.testing.assert_array_equal(o1[k].numpy(), o2[k].numpy(),
                                      err_msg=k)
