"""In-graph image normalization (the uint8-transfer fast path).

The model contract is (x - 0.5) * 2 on float RGB in [0, 1] (reference
src/visual_odometry/frontend.py:46 and train_multitask.py input prep).
Normalizing INSIDE the jitted program instead of on the host lets
callers ship frames as uint8 — a 4x smaller host->device transfer,
which dominates wall time on the tunneled backend (measured on a live
v5e: 1584 -> 1027 ms per 30-frame offline corridor sequence, ~460 ms
of it transfer size; artifacts/offline_wall_probe.json).

Quality: on the bf16 compute path the u8 quantization step in [-1, 1]
(2/255 ~= 0.0078) equals the bf16 input-cast ulp near +-1 that the
first conv applies anyway, so u8 transfer is quality-neutral there.
On f32 compute it is a real (if tiny) input perturbation — callers
auto-enable it only for bf16 models.
"""

from __future__ import annotations


def to_model_input(raw):
    """uint8 raw or float [0, 1] -> [-1, 1] f32, IN-GRAPH.

    dtype is static at trace time, so the branch costs nothing; the
    float path's program is identical to host-side normalization.
    """
    import jax.numpy as jnp

    x = raw.astype(jnp.float32)
    if raw.dtype == jnp.uint8:
        # true division, not *(1/255), matching the host-side u8/255.
        # convention; XLA may still fuse it into the normalize (fma),
        # so the two paths agree to 1 ulp, not bitwise
        x = x / 255.0
    return (x - 0.5) * 2.0


def quantize_u8(frames01):
    """float [0, 1] frames -> uint8 for transfer (round-to-nearest).

    The inverse of to_model_input's /255 branch up to the 2/255
    quantization step. Frames should be RESIZED in float first (the
    r3 uint8-resize finding: u8 cv2.resize quantizes interpolated
    values, a noise floor that flips ratio-test survivors) — only the
    transfer quantizes.
    """
    import numpy as np

    return np.clip(np.rint(np.asarray(frames01) * 255.0),
                   0, 255).astype(np.uint8)
