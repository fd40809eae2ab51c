"""vo_eval.py CLI smoke tests (slow tier): the offline path with each
supported matcher on the tiny synthetic-KITTI fixture. Pins the CLI
wiring (matcher dispatch, lg checkpoint loading, artifact writing) that
unit tests of OfflineVO cannot see. Reference surface: vo_eval.py
(reference root) whole-sequence evaluation."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def kitti_fixture():
    path = os.path.join(_REPO, "fixtures", "kitti_synth")
    if not os.path.exists(os.path.join(path, "06.txt")):
        sys.path.insert(0, os.path.join(_REPO, "scripts"))
        from make_synthetic_kitti import make_sequence

        make_sequence(path, 12)
    return path


@pytest.mark.parametrize("matcher", ["dense", "bf"])
def test_vo_eval_offline_cli(kitti_fixture, tmp_path, matcher):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = tmp_path / "vo.json"
    r = subprocess.run(
        [sys.executable, "vo_eval.py", "--kitti_path", kitti_fixture,
         "--config", "N", "--n_classes", "8", "--im_h", "96",
         "--im_w", "128", "--offline", "--matcher", matcher,
         "--max_frames", "6", "--out", str(out)],
        cwd=_REPO, env=env, timeout=1800, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    res = json.load(open(out))["results"]
    assert res["estimation_fails"] == 0
    assert len(res["trajectory"]) == 6  # one entry per frame
    assert res["total"]["mean"] >= 0.0
