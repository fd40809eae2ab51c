"""Extra loss functions + QAT + semantic matching tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.losses.depth_extras import (berhu, grad_loss,
                                                 jaccard_distance_loss, l1,
                                                 l1_log, normal_loss, rmse,
                                                 rmse_log, sobel_gradients)
from nanovs_slam_tpu.quant import fake_quant_ste, qat_params
from nanovs_slam_tpu.vo.matcher import match_semantic

torch = pytest.importorskip("torch")


def test_depth_extras_match_torch_formulas():
    rs = np.random.RandomState(0)
    pred = rs.rand(64).astype(np.float32) + 0.5
    gt = rs.rand(64).astype(np.float32) + 0.5
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)

    assert abs(float(rmse_log(jnp.asarray(pred), jnp.asarray(gt)))
               - float(torch.sqrt(torch.mean(
                   torch.abs(torch.log(tg) - torch.log(tp)) ** 2)))) < 1e-6
    assert abs(float(l1(jnp.asarray(pred), jnp.asarray(gt)))
               - float(torch.mean(torch.abs(10 * tg - 10 * tp)))) < 1e-5
    assert abs(float(l1_log(jnp.asarray(pred), jnp.asarray(gt)))
               - float(torch.mean(torch.abs(torch.log(tg)
                                            - torch.log(tp))))) < 1e-6
    assert abs(float(rmse(jnp.asarray(pred), jnp.asarray(gt)))
               - float(torch.sqrt(torch.mean(
                   torch.abs(10 * tg - 10 * tp) ** 2)))) < 1e-5


def test_jaccard_loss_zero_for_identical():
    y = jnp.asarray(np.eye(4, dtype=np.float32))
    l = jaccard_distance_loss(y, y)
    np.testing.assert_allclose(np.asarray(l), 0.0, atol=1e-5)


def test_sobel_and_grad_losses():
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(2, 16, 16, 1).astype(np.float32))
    gy, gx = sobel_gradients(img)
    assert gy.shape == img.shape and gx.shape == img.shape
    g = jnp.concatenate([gy.reshape(2, -1, 1), gx.reshape(2, -1, 1)], -1)
    assert float(grad_loss(g, g)) == 0.0
    assert float(normal_loss(g + 1e-6, g)) < 1e-3
    assert float(berhu(img, img)) == 0.0


def test_fake_quant_ste_gradient_passthrough():
    w = jnp.asarray(np.random.RandomState(2).randn(8, 8).astype(np.float32))

    def f(w):
        return jnp.sum(fake_quant_ste(w) ** 2)

    g = jax.grad(f)(w)
    # STE: gradient ~ 2*quantized(w) (passes through the rounding)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

    # quantization error bounded by half a step
    q = fake_quant_ste(w)
    step = float(jnp.max(jnp.abs(w))) / 127.0
    assert float(jnp.max(jnp.abs(q - w))) <= step


def test_qat_params_structure():
    tree = {"a": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones(8)},
            "bn": {"scale": jnp.ones(8)}}
    out = qat_params(tree)
    assert out["a"]["kernel"].shape == (3, 3, 4, 8)
    np.testing.assert_array_equal(np.asarray(out["a"]["bias"]), 1.0)


def test_match_semantic_respects_classes():
    rs = np.random.RandomState(3)
    desc = rs.randn(40, 16).astype(np.float32)
    kps = rs.rand(40, 2).astype(np.float32) * 100
    seg = np.array([0] * 20 + [1] * 20)
    k0, k1 = match_semantic(kps, desc, seg, kps, desc, seg, n_classes=2)
    assert len(k0) == 40  # identity matching within each class
    np.testing.assert_allclose(k0, k1)
    # scrambled classes in frame 2: cross-class pairs can't match
    seg2 = 1 - seg
    k0b, _ = match_semantic(kps, desc, seg, kps, desc, seg2, n_classes=2)
    assert len(k0b) == 0 or not np.allclose(k0b[:5], k0[:5])
