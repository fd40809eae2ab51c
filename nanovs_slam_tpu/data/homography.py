"""Random homography sampling + on-device homography image warping.

Behavioral contract (reference: src/data/dataset_utils.py:9-136
sample_homography; tgm.HomographyWarper used for the image/seg/depth warps,
dataset_utils.py:198,217-218 and KeypointNetwithIOLoss.py:316-319):

- sample_homography draws perspective/scale/translation/rotation corner
  perturbations in normalized [-1,1] coords (y pre-scaled by h/w ratio) and
  solves the 8-dof DLT via pinv. Host-side numpy, seedable RNG.
- HomographyWarper(h, w)(src, H): for every destination pixel p in
  normalized coords, samples src at H @ p (grid_sample convention,
  align_corners=True in torchgeometry). Our warp runs ON DEVICE via the
  grid_sample op, so train-time warping is part of the jitted step instead
  of a host DataLoader worker.
"""

from __future__ import annotations

from math import pi
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample

Array = jnp.ndarray


def sample_homography(
    shape: Tuple[int, int],
    rng: Optional[np.random.RandomState] = None,
    perspective: bool = True,
    scaling: bool = True,
    rotation: bool = True,
    translation: bool = True,
    n_scales: int = 100,
    n_angles: int = 100,
    scaling_amplitude: float = 0.2,
    perspective_amplitude: float = 0.2,
    patch_ratio: float = 0.7,
    max_angle: float = pi / 2,
) -> np.ndarray:
    """Sample a random 3x3 homography in normalized coords (numpy, host)."""
    rng = rng or np.random
    hw_ratio = float(shape[0]) / float(shape[1])

    pts1 = np.array([[-1.0, -1.0], [-1.0, 1.0], [1.0, -1.0], [1.0, 1.0]])
    pts2 = pts1 * patch_ratio
    pts2[:, 1] *= hw_ratio

    if perspective:
        amp = perspective_amplitude / 2
        px = np.clip(rng.normal(0.0, amp, 2), -amp, amp)
        py = np.clip(rng.normal(0.0, hw_ratio * amp, 2),
                     -hw_ratio * amp, hw_ratio * amp)
        pts2[0] -= [px[1], py[1]]
        pts2[1] += [-px[0], py[1]]
        pts2[2] += [px[1], -py[0]]
        pts2[3] += [px[0], py[0]]

    if scaling:
        amp = scaling_amplitude / 2
        scales = np.clip(rng.normal(1.0, amp, n_scales), 1 - amp, 1 + amp)
        center = pts2.mean(axis=0, keepdims=True)
        s = scales[rng.randint(n_scales)]
        pts2 = (pts2 - center) * s + center

    if translation:
        t_min = np.min(pts2 - [-1.0, -hw_ratio], axis=0)
        t_max = np.min([1.0, hw_ratio] - pts2, axis=0)
        pts2 += np.array([rng.uniform(-t_min[0], t_max[0]),
                          rng.uniform(-t_min[1], t_max[1])])[None]

    if rotation:
        angles = np.concatenate([[0.0],
                                 np.linspace(-max_angle, max_angle, n_angles)])
        center = pts2.mean(axis=0, keepdims=True)
        rot = np.stack([np.cos(angles), -np.sin(angles),
                        np.sin(angles), np.cos(angles)], axis=1).reshape(-1, 2, 2)
        rotated = np.matmul((pts2 - center)[None], rot) + center
        valid = np.where(np.all((rotated >= [-1.0, -hw_ratio])
                                & (rotated < [1.0, hw_ratio]), axis=(1, 2)))[0]
        pts2 = rotated[valid[rng.randint(len(valid))]]

    pts2 = pts2.copy()
    pts2[:, 1] /= hw_ratio

    # DLT: solve for H mapping pts1 -> pts2 with pinv (dataset_utils:123-135)
    def ax(p, q):
        return [p[0], p[1], 1, 0, 0, 0, -p[0] * q[0], -p[1] * q[0]]

    def ay(p, q):
        return [0, 0, 0, p[0], p[1], 1, -p[0] * q[1], -p[1] * q[1]]

    a_mat = np.stack([f(pts1[i], pts2[i]) for i in range(4)
                      for f in (ax, ay)])
    p_vec = np.array([pts2[i][j] for i in range(4) for j in range(2)])
    h = np.linalg.pinv(a_mat) @ p_vec
    return np.concatenate([h, [1.0]]).reshape(3, 3).astype(np.float32)


def homography_warp_image(img: Array, homography: Array,
                          mode: str = "nearest") -> Array:
    """Warp an image batch by per-image homographies on device.

    img (B, H, W, C); homography (B, 3, 3) in normalized coords.
    out[p] = img[H @ p] for destination pixel p (torchgeometry
    HomographyWarper semantics, align_corners grid).
    """
    B, H, W, C = img.shape
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    src = jnp.einsum("bdc,hwc->bhwd", homography, grid)
    src = src[..., :2] / src[..., 2:3]
    return grid_sample(img, src, mode=mode)


def warp_image_batch(img: Array, homography: Array,
                     mode: str = "nearest") -> Array:
    return homography_warp_image(img, homography, mode)


def homography_to_pixel(H_norm: np.ndarray,
                        shape: Tuple[int, int]) -> np.ndarray:
    """Normalized sampling homography -> pixel point-transfer matrix.

    `homography_warp_image` uses image_aug(p) = image(H_norm @ p) in
    normalized align-corners coords, so a keypoint at pixel x in `image`
    lands at x' = (Ninv @ H_norm @ N)^-1 @ x in `image_aug`. The returned
    matrix is that point transfer — the HPatches H_1_N convention the
    evaluators expect (evaluation/detector.py warp_keypoints)."""
    h, w = shape
    N = np.array([[2.0 / (w - 1), 0.0, -1.0],
                  [0.0, 2.0 / (h - 1), -1.0],
                  [0.0, 0.0, 1.0]], np.float64)
    H_pix_sampling = np.linalg.inv(N) @ np.asarray(H_norm, np.float64) @ N
    H = np.linalg.inv(H_pix_sampling)
    return (H / H[2, 2]).astype(np.float32)
