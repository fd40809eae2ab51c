"""Secondary dataset loaders: NYUv2, SceneParse150/ADE20K, Tokyo 24/7.

Behavioral contract:
- NYUv2 (reference src/data/nyuv2.py:339-382 extracted-files variant):
  rgb/ + seg{13,40}/ + depth/ folder layout; depth float images; used for
  the experimental depth head.
- SceneParse150 (src/data/scene_parse_150.py): ADE20K-style images +
  annotations with the 150 -> 7 super-class remap
  (scene_parse_mapping.py:3-182; the 7-class grouping table is data from
  the reference).
- Tokyo 24/7 / TokyoTM (src/data/tokyo247.py): NetVLAD dbStruct .mat like
  Pittsburgh — reuses data/pittsburgh.py parsing (same format), fixing the
  reference's hardcoded-root bug (tokyo247.py:14-18) by taking the root
  as an argument.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Tuple

import numpy as np

# ADE20K 150 classes -> 7 super classes (0 stays unlabeled/ignore-ish).
# Grouping follows the reference scene_parse_mapping.py: structure(1),
# nature(2), sky(3), person(4), vehicle(5), object(6), ground(7).
_SCENE_PARSE_GROUPS: Dict[int, Tuple[int, ...]] = {
    1: (0, 1, 3, 5, 8, 14, 18, 22, 24, 27, 30, 33, 42, 48, 52, 58, 63,
        78, 85, 94),
    2: (4, 9, 17, 29, 34, 46, 60, 66, 72),
    3: (2,),
    4: (12,),
    5: (20, 80, 83, 90, 102, 103, 116, 127),
    7: (6, 11, 13, 26, 28, 46, 54, 59, 96, 101),
}


def scene_parse_lut() -> np.ndarray:
    """151-entry LUT (ADE20K annotation ids 0..150, 0 = unlabeled):
    everything not in a group -> class 6 ('object')."""
    lut = np.full(256, 6, np.uint8)
    lut[0] = 0
    for cls, ids in _SCENE_PARSE_GROUPS.items():
        for i in ids:
            lut[i + 1] = cls  # annotations are 1-indexed classes
    return lut


class NYUv2Dataset:
    """rgb/ + seg13/ (or seg40/) + depth/ folder layout."""

    def __init__(self, root: str, size: Tuple[int, int],
                 n_seg_classes: int = 13):
        self.size = size
        seg_dir = f"seg{n_seg_classes}"
        self.rgb = sorted(glob.glob(os.path.join(root, "rgb", "*")))
        self.seg = sorted(glob.glob(os.path.join(root, seg_dir, "*")))
        self.depth = sorted(glob.glob(os.path.join(root, "depth", "*")))

    def __len__(self):
        return len(self.rgb)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import cv2

        H, W = self.size
        img = cv2.cvtColor(cv2.imread(self.rgb[i]), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (W, H)).astype(np.float32) / 255.0
        out = {"image": img}
        if i < len(self.seg):
            seg = cv2.imread(self.seg[i], cv2.IMREAD_GRAYSCALE)
            out["seg"] = cv2.resize(seg, (W, H),
                                    interpolation=cv2.INTER_NEAREST)
        else:
            out["seg"] = np.zeros((H, W), np.uint8)
        if i < len(self.depth):
            d = cv2.imread(self.depth[i], cv2.IMREAD_UNCHANGED)
            d = cv2.resize(d.astype(np.float32), (W, H))
            d = d / max(float(d.max()), 1e-6)
            out["depth"] = np.clip(d, 1e-3, 1.0)[..., None]
        return out


class SceneParse150Dataset:
    """ADE20K/SceneParse150 images/ + annotations/ with 150->7 remap."""

    def __init__(self, root: str, size: Tuple[int, int],
                 split: str = "training"):
        self.size = size
        self.lut = scene_parse_lut()
        self.images = sorted(glob.glob(
            os.path.join(root, "images", split, "*.jpg")))
        self.masks = [p.replace(os.sep + "images" + os.sep,
                                os.sep + "annotations" + os.sep)
                      .replace(".jpg", ".png") for p in self.images]
        pairs = [(i, m) for i, m in zip(self.images, self.masks)
                 if os.path.exists(m)]
        self.images = [p[0] for p in pairs]
        self.masks = [p[1] for p in pairs]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import cv2

        H, W = self.size
        img = cv2.cvtColor(cv2.imread(self.images[i]), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (W, H)).astype(np.float32) / 255.0
        seg = cv2.imread(self.masks[i], cv2.IMREAD_GRAYSCALE)
        seg = cv2.resize(seg, (W, H), interpolation=cv2.INTER_NEAREST)
        return {"image": img, "seg": self.lut[seg]}


def tokyo247_dataset(root: str, size: Tuple[int, int],
                     struct_name: str = "tokyo247.mat"):
    """Tokyo 24/7 via the shared NetVLAD dbStruct machinery."""
    from .pittsburgh import WholeDataset

    struct = os.path.join(root, "datasets", struct_name)
    return WholeDataset(struct, root, size)
