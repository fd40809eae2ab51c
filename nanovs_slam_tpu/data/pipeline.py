"""Training data pipeline: host-side decode/augment, DEVICE-side
homography-pair generation.

Behavioral contract (reference: src/data/coco.py:43-140 get_coco_transforms
/ dataset_utils.py:161-269): per sample, resize image+mask, random
grayscale/equalize (train), sample a random homography, build the warped
pair with a nearest-mode homography warper, downsample masks to H/d_f,
color-jitter+blur (train), normalize image to [-1, 1].

TPU-first split: PIL/cv2 decode + resize + photometric augs stay on host
(numpy/cv2); the homography WARP runs on device inside one jitted
`build_pair_batch` (reusing the grid-sample op), so per-step warping is
fused into the training program instead of burning DataLoader workers
(the reference's tgm.HomographyWarper host path).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .homography import homography_warp_image, sample_homography

Array = jnp.ndarray


def nearest_downsample(x: Array, factor: int) -> Array:
    """(B, H, W, ...) -> (B, H/f, W/f, ...) nearest (stride) downsample."""
    return x[:, ::factor, ::factor]


@functools.partial(jax.jit, static_argnames=("d_f", "with_depth"))
def build_pair_batch(images: Array, segs: Array, homographies: Array,
                     depths: Optional[Array] = None, d_f: int = 2,
                     with_depth: bool = False) -> Dict[str, Array]:
    """images (B,H,W,3) in [0,1]; segs (B,H,W) int; homographies (B,3,3);
    optional depths (B,H,W,1) -> training batch dict (reference tensor
    contract: image/image_aug in [-1,1], seg/seg_aug at H/d_f)."""
    seg_f = segs[..., None].astype(jnp.float32)
    img_aug = homography_warp_image(images, homographies, mode="nearest")
    seg_aug = homography_warp_image(seg_f, homographies, mode="nearest")

    batch = {
        "image": images * 2.0 - 1.0,
        "image_aug": img_aug * 2.0 - 1.0,
        "seg": nearest_downsample(seg_f, d_f)[..., 0].astype(jnp.int32),
        "seg_aug": nearest_downsample(seg_aug, d_f)[..., 0].astype(jnp.int32),
        "homography": homographies,
    }
    if with_depth and depths is not None:
        depth_aug = homography_warp_image(depths, homographies,
                                          mode="nearest")
        batch["depth"] = nearest_downsample(depths, d_f)
        batch["depth_aug"] = nearest_downsample(depth_aug, d_f)
    return batch


def random_grayscale(img: np.ndarray, rng: np.random.RandomState,
                     p: float = 0.2) -> np.ndarray:
    if rng.rand() < p:
        g = img @ np.array([0.299, 0.587, 0.114], np.float32)
        return np.repeat(g[..., None], 3, axis=-1)
    return img


def random_equalize(img: np.ndarray, rng: np.random.RandomState,
                    p: float = 0.2) -> np.ndarray:
    if rng.rand() < p:
        import cv2

        u8 = (img * 255).astype(np.uint8)
        for c in range(3):
            u8[..., c] = cv2.equalizeHist(u8[..., c])
        return u8.astype(np.float32) / 255.0
    return img


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness=0.1, contrast=0.1, saturation=0.1,
                 hue=0.1) -> np.ndarray:
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    img = img * b
    mean = img.mean()
    img = (img - mean) * c + mean
    g = img @ np.array([0.299, 0.587, 0.114], np.float32)
    s = 1.0 + rng.uniform(-saturation, saturation)
    img = g[..., None] + (img - g[..., None]) * s
    return np.clip(img, 0.0, 1.0)


def gaussian_blur(img: np.ndarray, rng: np.random.RandomState,
                  ksize: int = 3, sigma=(0.1, 1.0)) -> np.ndarray:
    import cv2

    s = rng.uniform(*sigma)
    return cv2.GaussianBlur(img, (ksize, ksize), s)


class PairLoader:
    """Iterates (host-augmented arrays + device-built pair batches) over a
    base dataset yielding dicts with image (H,W,3 [0,1] f32), seg (H,W)
    int, optional depth (H,W,1) f32 — all pre-resized to (im_h, im_w)."""

    def __init__(self, dataset, batch_size: int, im_h: int, im_w: int,
                 d_f: int = 2, train: bool = True, seed: int = 42069,
                 with_depth: bool = False, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.im_h, self.im_w = im_h, im_w
        self.d_f = d_f
        self.train = train
        self.rng = np.random.RandomState(seed)
        self.with_depth = with_depth
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _host_augment(self, img: np.ndarray) -> np.ndarray:
        if not self.train:
            return img
        img = random_grayscale(img, self.rng)
        img = random_equalize(img, self.rng)
        img = color_jitter(img, self.rng)
        img = gaussian_blur(img, self.rng)
        return img.astype(np.float32)

    def __iter__(self) -> Iterator[Dict[str, Array]]:
        order = np.arange(len(self.dataset))
        if self.train:
            self.rng.shuffle(order)
        B = self.batch_size
        n_full = len(order) // B
        for bi in range(len(self)):
            idxs = order[bi * B: (bi + 1) * B]
            imgs, segs, depths, homos = [], [], [], []
            for i in idxs:
                item = self.dataset[int(i)]
                imgs.append(self._host_augment(item["image"]))
                segs.append(item["seg"])
                if self.with_depth:
                    depths.append(item.get(
                        "depth", np.zeros((self.im_h, self.im_w, 1),
                                          np.float32)))
                homos.append(sample_homography((self.im_h, self.im_w),
                                               self.rng))
            batch = build_pair_batch(
                jnp.asarray(np.stack(imgs), jnp.float32),
                jnp.asarray(np.stack(segs), jnp.int32),
                jnp.asarray(np.stack(homos), jnp.float32),
                jnp.asarray(np.stack(depths), jnp.float32)
                if self.with_depth else None,
                d_f=self.d_f, with_depth=self.with_depth)
            yield batch
