"""SceneParse150 mapping + NYUv2 loader fidelity vs the reference tables.

The 150->8 LUT is asserted equal to the LUT the reference itself builds
(/root/reference/src/data/scene_parse_mapping.py:170-182), loaded directly
from the reference file — so the table can't silently drift (VERDICT r1 #4).
"""

import importlib.util
import os

import numpy as np
import pytest

from conftest import reference_available

from nanovs_slam_tpu.data.extra_datasets import (SCENE_PARSE_CLASSES,
                                                 scene_parse_lut)


def test_lut_is_total_and_duplicate_free():
    lut = scene_parse_lut()
    assert lut.shape == (256,)
    assert lut[0] == 0  # "None"
    assert set(np.unique(lut[1:151]).tolist()) <= set(range(8))
    # every one of the 150 ids is explicitly assigned (no catch-all)
    assert (lut[151:] == 0).all()
    assert len(SCENE_PARSE_CLASSES) == 8


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
def test_lut_matches_reference_table():
    path = "/root/reference/src/data/scene_parse_mapping.py"
    spec = importlib.util.spec_from_file_location("ref_scene_parse", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.get_mapping().numpy()  # 151-entry torch LUT
    lut = scene_parse_lut()
    np.testing.assert_array_equal(lut[:151], ref)
    # class-name ordering matches class_to_index
    for name, idx in mod.class_to_index.items():
        assert SCENE_PARSE_CLASSES[idx] == name


def test_nyuv2_depth_matches_reference_math(tmp_path):
    """Depth values must be clamp(d, min, max)/max with FIXED max_depth
    (reference nyuv2.py:70), not per-image normalization."""
    import cv2

    H, W = 24, 32
    for kind in ("image", "depth", "seg13"):
        (tmp_path / kind / "train").mkdir(parents=True)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (H, W, 3), np.uint8)
    depth_mm = rs.randint(0, 9000, (H, W)).astype(np.uint16)  # some > max
    seg = rs.randint(0, 13, (H, W)).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "image" / "train" / "0.png"), img)
    cv2.imwrite(str(tmp_path / "depth" / "train" / "0.png"), depth_mm)
    cv2.imwrite(str(tmp_path / "seg13" / "train" / "0.png"), seg)

    from nanovs_slam_tpu.data.extra_datasets import NYUv2Dataset

    ds = NYUv2Dataset(str(tmp_path), (H, W), n_seg_classes=13,
                      split="train", max_depth=5000.0)
    assert len(ds) == 1
    s = ds[0]
    expected = np.clip(depth_mm.astype(np.float32), 0, 5000.0) / 5000.0
    np.testing.assert_allclose(s["depth"][..., 0], expected, atol=1e-6)
    assert s["depth"].max() <= 1.0 and s["depth"].min() >= 0.0
    np.testing.assert_array_equal(s["seg"], seg)
    # invalid class counts rejected like the reference assert
    with pytest.raises(AssertionError):
        NYUv2Dataset(str(tmp_path), (H, W), n_seg_classes=7)


def test_scene_parse_dataset_applies_lut(tmp_path):
    import cv2

    img_dir = tmp_path / "images" / "training"
    ann_dir = tmp_path / "annotations" / "training"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rs.randint(0, 255, (32, 48, 3), np.uint8))
    ann = rs.randint(0, 151, (32, 48)).astype(np.uint8)
    cv2.imwrite(str(ann_dir / "a.png"), ann)

    from nanovs_slam_tpu.data.extra_datasets import SceneParse150Dataset

    ds = SceneParse150Dataset(str(tmp_path), (32, 48))
    assert len(ds) == 1
    sample = ds[0]
    assert sample["seg"].max() <= 7
    # id 13 (person) must land on class 1 wherever it appears unscaled
    lut = scene_parse_lut()
    np.testing.assert_array_equal(sample["seg"], lut[ann])


def _hf_available():
    try:
        import datasets  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _hf_available(), reason="hf datasets not installed")
def test_nyuv2_hf_variant(tmp_path):
    """HF-hub NYUv2 loader (reference nyuv2.py:301-338): depth_map renamed
    to depth, metre-scale clamp/max normalization; works from a live
    datasets.Dataset and from an on-disk save_to_disk cache."""
    import datasets as hf

    H, W = 16, 24
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(3)]
    depths = [rs.rand(H, W).astype(np.float32) * 12.0 for _ in range(3)]
    ds = hf.Dataset.from_dict({
        "image": [i.tolist() for i in imgs],
        "depth_map": [d.tolist() for d in depths],
    })

    from nanovs_slam_tpu.data.extra_datasets import NYUv2HFDataset

    loader = NYUv2HFDataset(ds, (H, W), split="train", max_depth=10.0)
    assert len(loader) == 3
    s = loader[0]
    assert s["image"].shape == (H, W, 3) and s["image"].dtype == np.float32
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    expected = np.clip(depths[0], 0.0, 10.0) / 10.0
    np.testing.assert_allclose(s["depth"][..., 0], expected, atol=1e-6)
    assert s["seg"].shape == (H, W)  # schema stays stable without labels

    # reference caching protocol: save_to_disk dir loads without the hub
    ds.save_to_disk(str(tmp_path / "validation"))
    loader2 = NYUv2HFDataset(str(tmp_path), (H, W), split="validation")
    np.testing.assert_allclose(loader2[1]["depth"], loader[1]["depth"])

    with pytest.raises(AssertionError):
        NYUv2HFDataset(ds, (H, W), split="test")


@pytest.mark.skipif(not _hf_available(), reason="hf datasets not installed")
def test_scene_parse_hf_variant():
    """HF-hub SceneParse150 loader (reference scene_parse_150.py:183-259):
    n_classes=7 applies the 150->8 LUT, n_classes=150 keeps raw ids."""
    import datasets as hf

    H, W = 16, 24
    rs = np.random.RandomState(1)
    imgs = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(2)]
    anns = [rs.randint(0, 151, (H, W)).astype(np.uint8) for _ in range(2)]
    ds = hf.Dataset.from_dict({
        "image": [i.tolist() for i in imgs],
        "annotation": [a.tolist() for a in anns],
    })

    from nanovs_slam_tpu.data.extra_datasets import SceneParse150HFDataset

    lut = scene_parse_lut()
    mapped = SceneParse150HFDataset(ds, (H, W), n_classes=7)
    np.testing.assert_array_equal(mapped[0]["seg"], lut[anns[0]])
    raw = SceneParse150HFDataset(ds, (H, W), n_classes=150)
    np.testing.assert_array_equal(raw[1]["seg"], anns[1])
    with pytest.raises(AssertionError):
        SceneParse150HFDataset(ds, (H, W), n_classes=28)
