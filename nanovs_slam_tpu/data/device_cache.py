"""Device-resident dataset cache: zero per-step host->device image traffic.

The reference feeds training through DataLoader workers that re-upload
every batch (train_multitask.py:414-427). On a tunneled/remote TPU the
per-step upload dominates wall-clock (measured 1.9 s/step vs 13.7 ms/step
device-resident at 96x128 B=16 — a 140x gap). For datasets that fit in
HBM (synthetic sets, NYUv2-extracted subsets, cached COCO shards), this
loader uploads the whole set ONCE and assembles each training batch on
device inside a single jitted program: index gather + photometric
augmentation + homography-pair warp (reusing data/pipeline.py's
build_pair_batch). The only per-step uploads are the (B,) sample indices
and (B,3,3) homographies — a few hundred bytes.

Image/seg planes cache as uint8 when lossless (store_u8="auto"):
anything decoded from an 8-bit source is exactly k/255, so u8 + an
in-graph /255 at batch assembly reproduces the f32 cache to 1 ulp
while quadrupling HBM dataset capacity and shrinking the one-time
upload 4x (the same transfer economics as the VO u8 path,
ops/image.py).

Photometric augs here are the device-side analogs of the host pipeline's
random grayscale / brightness / contrast (data/pipeline.py; blur and
equalize are host-only and skipped in this path — acceptable for
descriptor learning, documented divergence).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .homography import sample_homography
from .pipeline import build_pair_batch

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=("augment",))
def _photometric(images: Array, rng: jax.Array, augment: bool = True) -> Array:
    """Per-sample random grayscale (p=0.2) + brightness/contrast jitter
    (+-0.1), matching the host pipeline's distributions; [0,1] in/out."""
    if not augment:
        return images
    B = images.shape[0]
    r_gray, r_b, r_c = jax.random.split(rng, 3)
    gray = jnp.einsum("bhwc,c->bhw", images,
                      jnp.array([0.299, 0.587, 0.114]))[..., None]
    use_gray = (jax.random.uniform(r_gray, (B, 1, 1, 1)) < 0.2)
    images = jnp.where(use_gray, gray, images)
    b = 1.0 + jax.random.uniform(r_b, (B, 1, 1, 1), minval=-0.1, maxval=0.1)
    c = 1.0 + jax.random.uniform(r_c, (B, 1, 1, 1), minval=-0.1, maxval=0.1)
    images = images * b
    mean = images.mean(axis=(1, 2, 3), keepdims=True)
    images = (images - mean) * c + mean
    return jnp.clip(images, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("d_f", "with_depth", "augment"))
def _assemble(images: Array, segs: Array, depths: Optional[Array],
              idx: Array, homos: Array, rng: jax.Array, d_f: int,
              with_depth: bool, augment: bool) -> Dict[str, Array]:
    imgs = images[idx]
    segs = segs[idx]
    # u8-cached planes (4x HBM capacity / gather traffic, see
    # DeviceCachedPairLoader store_u8) decode in-graph; dtype is static
    # at trace time so the f32 path is untouched
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    if segs.dtype == jnp.uint8:
        segs = segs.astype(jnp.int32)
    imgs = _photometric(imgs, rng, augment)
    return build_pair_batch(imgs, segs, homos,
                            depths[idx] if with_depth else None,
                            d_f=d_f, with_depth=with_depth)


def _lossless_u8(stack: np.ndarray) -> bool:
    """True iff every value is exactly k/255 — the case for any image
    decoded from an 8-bit source, where u8 caching is bitwise-lossless."""
    scaled = stack * 255.0
    return bool(np.abs(scaled - np.rint(scaled)).max() < 1e-4)


class DeviceCachedPairLoader:
    """Drop-in for PairLoader when the dataset fits in HBM."""

    def __init__(self, dataset, batch_size: int, H: int, W: int,
                 d_f: int = 2, train: bool = True, seed: int = 0,
                 with_depth: bool = False, sharding=None,
                 store_u8: str | bool = "auto"):
        """store_u8: cache image (and seg-id) planes as uint8 on device —
        4x HBM dataset capacity and a 4x smaller one-time upload, decoded
        in-graph at batch assembly. "auto" (default) enables it only when
        LOSSLESS: images whose values are exactly k/255 (anything decoded
        from an 8-bit source; resize happens in float BEFORE the check so
        interpolated values keep full precision when they need it) and
        segs whose ids fit u8. True forces image quantization (a 2/255
        step on float-synthetic data); False keeps f32/int32."""
        import cv2

        self.batch_size = batch_size
        self.H, self.W, self.d_f = H, W, d_f
        self.train = train
        self.with_depth = with_depth
        self.seed = seed

        imgs, segs, depths = [], [], []
        for i in range(len(dataset)):
            item = dataset[i]
            img = item["image"]
            if img.shape[:2] != (H, W):
                img = cv2.resize(img, (W, H))
            seg = item.get("seg")
            if seg is None:
                seg = np.zeros((H, W), np.int32)
            elif seg.shape[:2] != (H, W):
                seg = cv2.resize(seg, (W, H),
                                 interpolation=cv2.INTER_NEAREST)
            imgs.append(img.astype(np.float32))
            segs.append(seg.astype(np.int32))
            if with_depth:
                d = item.get("depth",
                             np.zeros((H, W, 1), np.float32))
                if d.shape[:2] != (H, W):
                    d = cv2.resize(d, (W, H))[..., None]
                depths.append(d.astype(np.float32))

        def put(x):
            return (jax.device_put(x, sharding) if sharding is not None
                    else jax.device_put(x))

        img_stack = np.stack(imgs)          # (N,H,W,3) in [0,1]
        seg_stack = np.stack(segs)
        u8_imgs = (store_u8 is True
                   or (store_u8 == "auto" and _lossless_u8(img_stack)))
        if u8_imgs:
            img_stack = np.clip(np.rint(img_stack * 255.0),
                                0, 255).astype(np.uint8)
        if store_u8 and seg_stack.min() >= 0 and seg_stack.max() <= 255:
            seg_stack = seg_stack.astype(np.uint8)
        self.store_u8 = u8_imgs
        self.images = put(img_stack)        # one upload
        self.segs = put(seg_stack)
        self.depths = put(np.stack(depths)) if with_depth else None
        self.n = len(imgs)

    def __len__(self):
        return max(self.n // self.batch_size, 1)

    def nbytes(self) -> int:
        total = self.images.nbytes + self.segs.nbytes
        return total + (self.depths.nbytes if self.depths is not None else 0)

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, Array]]:
        """Yields device-resident batches; per-step upload is only the
        index vector + homographies."""
        rs = np.random.RandomState(self.seed + epoch_idx)
        order = rs.permutation(self.n) if self.train else np.arange(self.n)
        rng = jax.random.PRNGKey(self.seed + epoch_idx)
        B = self.batch_size
        for s in range(len(self)):
            idx = order[s * B:(s + 1) * B]
            if len(idx) < B:  # fixed shapes: wrap around
                idx = np.concatenate([idx, order[:B - len(idx)]])
            homos = np.stack([
                sample_homography((self.H, self.W), rs)
                for _ in range(B)]).astype(np.float32)
            yield _assemble(self.images, self.segs, self.depths,
                            jnp.asarray(idx, jnp.int32),
                            jnp.asarray(homos), jax.random.fold_in(rng, s),
                            self.d_f, self.with_depth, self.train)

    def epoch_arrays(self, epoch_idx: int):
        """The whole epoch's host-side randomness as three small arrays,
        for train/scan_epoch.py's one-program-per-epoch path: (S, B) sample
        indices, (S, B, 3, 3) homographies and the photometric-aug PRNG key.
        Draws from the SAME RandomState stream in the SAME order as
        epoch(), so a scanned epoch consumes bitwise-identical inputs to
        the step-at-a-time loop (equivalence pinned in
        tests/test_scan_epoch.py)."""
        rs = np.random.RandomState(self.seed + epoch_idx)
        order = rs.permutation(self.n) if self.train else np.arange(self.n)
        S, B = len(self), self.batch_size
        idx_all = np.empty((S, B), np.int32)
        homos = np.empty((S, B, 3, 3), np.float32)
        for s in range(S):
            idx = order[s * B:(s + 1) * B]
            if len(idx) < B:
                idx = np.concatenate([idx, order[:B - len(idx)]])
            idx_all[s] = idx
            homos[s] = np.stack([sample_homography((self.H, self.W), rs)
                                 for _ in range(B)])
        return (jnp.asarray(idx_all), jnp.asarray(homos),
                jax.random.PRNGKey(self.seed + epoch_idx))

    def cache_arrays(self):
        """The device-resident dataset planes (images, segs, depths) as
        explicit operands for jitted programs (scan_epoch passes them as
        arguments rather than closing over them)."""
        return self.images, self.segs, self.depths

    def __iter__(self):
        self._epoch_counter = getattr(self, "_epoch_counter", -1) + 1
        return self.epoch(self._epoch_counter)
