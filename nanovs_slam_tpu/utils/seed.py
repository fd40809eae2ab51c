"""Deterministic seeding (reference set_seed, utils/utils.py:40-47:
torch/cuda/numpy/random/cv2). JAX-native: numpy + python random + a root
jax PRNG key; device computation is deterministic by construction."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    try:
        import cv2

        cv2.setRNGSeed(seed)
    except Exception:
        pass
    return jax.random.PRNGKey(seed)
