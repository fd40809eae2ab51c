"""nanovs_slam_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of Nano-VS-SLAM.

A brand-new framework with the capabilities of ETH-PBL/Nano-VS-SLAM
(multitask tiny perception: keypoints + descriptors + segmentation + VPR
+ depth, LightGlue matching, visual odometry), designed TPU-first:

- NHWC layout, bf16 compute / f32 params, XLA convs on the MXU
- fused Pallas kernels for the postprocess hot path
  (cell-grid decode, bilinear grid-sample + L2 norm, NetVLAD)
- fixed-shape top-K keypoint pipelines (no data-dependent shapes)
- data parallelism via jax.sharding.Mesh + pjit/shard_map

Reference behavior is documented per-module with /root/reference
file:line citations; the implementation is original and idiomatic JAX.
"""

__version__ = "0.1.0"

from . import configs  # noqa: F401
