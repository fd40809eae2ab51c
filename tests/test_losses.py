"""Golden tests for loss functions vs torch reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.losses.depth import huber_loss, silog_loss
from nanovs_slam_tpu.losses.keypoint import (denormalize_uv, normalize_uv,
                                             warp_coords_homography)
from nanovs_slam_tpu.losses.segmentation import (cross_entropy_loss,
                                                 dice_loss)
from nanovs_slam_tpu.losses.triplet import (hard_triplet_loss,
                                            pairwise_distance)

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch():
    rs = np.random.RandomState(0)
    logits = rs.randn(2, 6, 8, 5).astype(np.float32)
    labels = rs.randint(0, 5, (2, 6, 8))
    labels[0, 0, :4] = 255  # ignored
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels).long(), ignore_index=255))
    assert abs(ours - theirs) < 1e-5


def test_dice_loss_basics():
    # perfect one-hot prediction -> loss ~ 0
    labels = np.random.RandomState(1).randint(0, 4, (2, 8, 8))
    logits = np.eye(4, dtype=np.float32)[labels] * 100.0
    l = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert l < 1e-4
    # ignore_index pixels don't contribute
    labels2 = labels.copy()
    labels2[:, :2] = 255
    l2 = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels2)))
    assert l2 < 1e-4


def test_pairwise_distance_matches_torch_formula():
    rs = np.random.RandomState(2)
    x = rs.randn(6, 12).astype(np.float32)
    ours = np.asarray(pairwise_distance(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    cor = xt @ xt.t()
    nm = cor.diag()
    d = torch.relu(nm.unsqueeze(1) - 2 * cor + nm.unsqueeze(0))
    mask = (d == 0.0).float()
    d = torch.sqrt(d + mask * 1e-16) * (1.0 - mask)
    np.testing.assert_allclose(ours, d.numpy(), atol=1e-5)


def test_hard_triplet_loss_reference_behavior():
    """Replicates HardTripletLoss(hardest=True) math (losses.py:38-60)."""
    rs = np.random.RandomState(3)
    emb = rs.randn(8, 16).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    ours = float(hard_triplet_loss(jnp.asarray(emb), jnp.asarray(labels)))

    d = np.asarray(pairwise_distance(jnp.asarray(emb)))
    same = labels[None] == labels[:, None]
    eye = np.eye(8, dtype=bool)
    hp = (d * (same & ~eye)).max(1)
    dn = d + d.max(1, keepdims=True) * same
    hn = dn.min(1)
    expected = np.mean(np.maximum(hp - hn + 0.1, 0))
    assert abs(ours - expected) < 1e-5


def test_huber_matches_torch():
    rs = np.random.RandomState(4)
    pred = rs.rand(100).astype(np.float32) * 3
    gt = rs.rand(100).astype(np.float32) * 3
    ours = float(huber_loss(jnp.asarray(pred), jnp.asarray(gt)))
    theirs = float(torch.nn.HuberLoss()(torch.from_numpy(pred),
                                        torch.from_numpy(gt)))
    assert abs(ours - theirs) < 1e-6


def test_silog_matches_reference_formula():
    rs = np.random.RandomState(5)
    pred = rs.rand(50).astype(np.float32) + 0.5
    gt = rs.rand(50).astype(np.float32) + 0.5
    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt)))
    g = torch.log(torch.from_numpy(pred)) - torch.log(torch.from_numpy(gt))
    expected = float(10 * torch.sqrt(torch.var(g) + 0.15 * g.mean() ** 2))
    assert abs(ours - expected) < 1e-4


def test_warp_coords_roundtrip():
    rs = np.random.RandomState(6)
    coords = rs.rand(2, 5, 4, 2).astype(np.float32) * 100
    H, W = 120, 160
    norm = normalize_uv(jnp.asarray(coords), H, W)
    back = denormalize_uv(norm, H, W)
    np.testing.assert_allclose(np.asarray(back), coords, atol=1e-4)

    eye = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    warped = warp_coords_homography(norm, eye)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(norm),
                               atol=1e-6)


def test_warp_coords_matches_reference_math():
    """_warp_homography_batch (KeypointNetwithIOLoss.py:928-957) torch math."""
    rs = np.random.RandomState(7)
    coords = (rs.rand(1, 4, 6, 2).astype(np.float32) * 2 - 1)
    h = np.eye(3, dtype=np.float32) + rs.randn(3, 3).astype(np.float32) * 0.05
    ours = np.asarray(warp_coords_homography(jnp.asarray(coords),
                                             jnp.asarray(h[None])))
    src = torch.from_numpy(coords[0].reshape(-1, 2))
    ht = torch.from_numpy(h)
    out = torch.addmm(ht[:, 2], src, ht[:, :2].t())
    out = out * (1.0 / out[:, 2].unsqueeze(1))
    expected = out[:, :2].reshape(4, 6, 2).numpy()
    np.testing.assert_allclose(ours[0], expected, atol=1e-5)


def test_masked_mean_broadcast_mask_batch_invariant():
    """Regression: a (1,Hc,Wc) mask against (B,Hc,Wc) values must give the
    same mean as the explicitly-broadcast mask. The unbroadcast variant
    inflated score_mse by B (found root-causing the 0.7 score-calibration
    drift vs the reference trainer, round 3)."""
    from nanovs_slam_tpu.losses.keypoint import masked_mean

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(8, 6, 7).astype(np.float32))
    mask = jnp.zeros((6, 7), bool).at[1:-1, 1:-1].set(True)
    got = float(masked_mean(x, mask[None]))
    want = float(np.mean(np.asarray(x)[:, 1:-1, 1:-1]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_score_mse_matches_torch_formula():
    """score_mse must equal the reference's masked MSE over interior
    cells, averaged over the full batch (KeypointNetwithIOLoss.py:506-520)."""
    import jax

    from nanovs_slam_tpu.losses.keypoint import keypoint_losses

    rs = np.random.RandomState(1)
    B, Hc, Wc, H, W = 4, 6, 8, 24, 32
    mk = lambda: {
        "score": jnp.asarray(rs.rand(B, Hc, Wc, 1).astype(np.float32)),
        "coord": jnp.asarray(
            (rs.rand(B, Hc, Wc, 2) * [W - 1, H - 1]).astype(np.float32)),
        "feat": jnp.asarray(rs.rand(B, Hc, Wc, 8).astype(np.float32)),
    }
    out, out_aug = mk(), mk()
    homo = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
    kp = keypoint_losses(out, out_aug, homo, H, W)

    from nanovs_slam_tpu.ops.grid_sample import grid_sample_bilinear
    res = grid_sample_bilinear(out["score"],
                               jax.lax.stop_gradient(
                                   kp["source_uv_warped_norm"]))
    diff2 = np.asarray(jnp.square(res - out_aug["score"]))[..., 0]
    want = diff2[:, 1:-1, 1:-1].mean()  # plain mean over batch x interior
    np.testing.assert_allclose(float(kp["score_mse"]), want, rtol=1e-6)
