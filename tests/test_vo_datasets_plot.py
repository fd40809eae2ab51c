"""VO dataset adapters + plotting utils tests (synthetic files)."""

import os

import numpy as np
import pytest

from nanovs_slam_tpu.utils.plot import (colorize_segmentation, get_colormap,
                                        latex_table, results_bar_chart)

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def frame_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(5):
        cv2.imwrite(str(d / f"{i:04d}.png"),
                    (rs.rand(32, 48, 3) * 255).astype(np.uint8))
    return str(d)


def test_folder_dataset(frame_dir):
    from nanovs_slam_tpu.vo.datasets import FolderDataset

    ds = FolderDataset(frame_dir)
    frames = list(ds)
    assert len(frames) == 5
    assert frames[0].shape == (32, 48, 3)


def test_folder_dataset_parallel(frame_dir):
    from nanovs_slam_tpu.vo.datasets import FolderDatasetParallel

    frames = list(FolderDatasetParallel(frame_dir))
    assert len(frames) == 5


def test_kitti_dataset(tmp_path):
    from nanovs_slam_tpu.vo.datasets import KittiDataset

    seq = tmp_path / "sequences" / "06" / "image_0"
    seq.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(seq / f"{i:06d}.png"),
                    np.zeros((16, 32, 3), np.uint8))
    np.savetxt(str(tmp_path / "sequences" / "06" / "times.txt"),
               np.arange(3) * 0.1)
    ds = KittiDataset(str(tmp_path), "06")
    assert len(ds) == 3 and ds.times is not None
    assert len(list(ds)) == 3


def test_colormaps():
    cmap = get_colormap(19)
    assert cmap.shape == (19, 3)
    seg = np.array([[0, 1], [18, 5]])
    rgb = colorize_segmentation(seg, 19)
    assert rgb.shape == (2, 2, 3)


def test_plot_and_table(tmp_path):
    p = results_bar_chart({"iou": 0.5, "f1": 0.7}, str(tmp_path / "r.png"))
    assert os.path.getsize(p) > 500
    tex = latex_table([{"model": "N", "iou": 0.5}], caption="t")
    assert "\\begin{table}" in tex and "0.5000" in tex
