"""End-to-end keypoint evaluation on a synthetic HPatches-format dataset:
real warped images written to disk, the full HPatchesDataset ->
infer -> repeatability/homography/mscore stack."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovs_slam_tpu.configs import get_config
from nanovs_slam_tpu.data.datasets import SyntheticShapesDataset
from nanovs_slam_tpu.data.hpatches import HPatchesDataset
from nanovs_slam_tpu.evaluation.keypoints import evaluate_keypoint_net
from nanovs_slam_tpu.inference import make_infer_fn
from nanovs_slam_tpu.models.kp2dtiny import build_model, init_model

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def hpatches_dir(tmp_path):
    """Two v_* sequences of 1.ppm..6.ppm with known H_1_N files."""
    rs = np.random.RandomState(0)
    base = SyntheticShapesDataset((240, 320), 2, n_classes=6, seed=7)
    for s in range(2):
        seq = tmp_path / f"v_seq{s}"
        seq.mkdir()
        img = (base[s]["image"] * 255).astype(np.uint8)
        cv2.imwrite(str(seq / "1.ppm"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        for i in range(2, 7):
            # small projective warp in pixel coords
            H = np.eye(3)
            H[0, 2] = rs.uniform(-15, 15)
            H[1, 2] = rs.uniform(-10, 10)
            H[0, 0] = 1 + rs.uniform(-0.05, 0.05)
            H[1, 1] = 1 + rs.uniform(-0.05, 0.05)
            warped = cv2.warpPerspective(img, H, (320, 240))
            cv2.imwrite(str(seq / f"{i}.ppm"),
                        cv2.cvtColor(warped, cv2.COLOR_RGB2BGR))
            np.savetxt(str(seq / f"H_1_{i}"), H)
    return str(tmp_path)


def test_hpatches_eval_pipeline(hpatches_dir):
    W, H = 320, 240
    ds = HPatchesDataset(hpatches_dir, (W, H))
    assert len(ds) == 10

    cfg = get_config("N", n_classes=6)
    model = build_model(cfg)
    params, bs = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    variables = {"params": params, "batch_stats": bs}
    infer = make_infer_fn(model, cfg, H, W, use_pallas=False)

    def infer_np(images):
        out = infer(variables, jnp.asarray(images, jnp.float32))
        return {k: np.asarray(v) for k, v in out.items()}

    # low threshold: random-init scores cluster near 0.5
    r = evaluate_keypoint_net(list(ds)[:4], infer_np, output_shape=(W, H),
                              top_k=300, conf_threshold=0.0)
    assert 0.0 <= r["repeatability"] <= 1.0
    assert 0.0 <= r["mscore"] <= 1.0
    assert set(r["homography_auc"]) == {1, 3, 5}
    # an untrained detector on structured images still repeats somewhat
    assert r["repeatability"] > 0.05
