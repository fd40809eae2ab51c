"""Full multitask training loss.

Behavioral contract (reference: KeypointNetwithIOLoss.forward,
KeypointNetwithIOLoss.py:389-605):

  total = kp_w * [ loc_w * loc + 2 * desc_w * triplet + score_w * usp
                   + 2 * score_w * score_mse + io_w * io ]
        + seg_w * 0.5 * [ segloss(clean) + segloss(aug) ]
        + vlad_w * hard_triplet(cat(vlad, vlad_aug), paired labels)
        + depth_w * [ d(clean) + d(aug) + 0.5 * MSE(depth_aug,
                                                    warp(depth, H)) ]

where the AUG view is the keypoint SOURCE and the clean view the TARGET
(:425-431), segloss = CE*0.5 + Dice*1.5 (:880-884), and d() = SILog +
Huber * huber_factor (:907-917).

All weights are dynamic scalars (the trainer's per-epoch weight schedules,
train_multitask.py:52-173, change them without recompiling the step).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..losses.depth import depth_loss as depth_loss_fn
from ..losses.keypoint import descriptor_loss, io_loss, keypoint_losses
from ..losses.segmentation import segmentation_loss
from ..losses.triplet import global_descriptor_loss
from ..data.homography import homography_warp_image

Array = jnp.ndarray


class LossWeights(NamedTuple):
    keypoint_loss: float = 1.0
    descriptor_loss: float = 2.0
    score_loss: float = 1.0
    loc_loss: float = 1.0
    io_loss: float = 1.0
    segmentation_loss: float = 2.0
    vlad_loss: float = 1.0
    depth_loss: float = 0.0
    huber_loss: float = 1.0


def default_loss_weights() -> LossWeights:
    return LossWeights()


def multitask_loss(out: Dict[str, Array], out_aug: Dict[str, Array],
                   batch: Dict[str, Array], H: int, W: int,
                   weights: LossWeights,
                   io_net_apply=None, io_params=None,
                   train_flags: Optional[Dict[str, bool]] = None,
                   relax_field: int = 4, io_top_k: int = 300,
                   ) -> tuple[Array, Dict[str, Array]]:
    """out/out_aug: POST-PROCESSED (train-mode) model outputs.
    batch: image/image_aug (unused here), seg/seg_aug (B,h,w) int32,
    homography (B,3,3), optional depth/depth_aug (B,h,w,1)."""
    flags = {"keypoints": True, "segmentation": True, "visloc": True,
             "depth": "depth" in out}
    if train_flags:
        flags.update(train_flags)

    loss_dict: Dict[str, Array] = {}
    total = jnp.float32(0.0)

    if flags["keypoints"]:
        kp = keypoint_losses(out, out_aug, batch["homography"], H, W,
                             relax_field)
        # the reference detaches the descriptor-loss sample coordinates
        # (KeypointNetwithIOLoss.py:464-465) — gradients reach the dense
        # descriptor maps only, not the keypoint locations
        metric_loss, recall = descriptor_loss(
            out_aug["feat"], out["feat"],
            jax.lax.stop_gradient(kp["source_uv_norm"]),
            jax.lax.stop_gradient(kp["source_uv_warped_norm"]),
            jax.lax.stop_gradient(kp["source_uv_warped"]), relax_field)
        keypoint_total = (weights.loc_loss * kp["loc_loss"]
                          + weights.descriptor_loss * 2.0 * metric_loss
                          + weights.score_loss * kp["usp_loss"]
                          + weights.score_loss * 2.0 * kp["score_mse"])
        if io_net_apply is not None:
            io = io_loss(out_aug["score"], out_aug["feat"], out["feat"],
                         out["score"], kp["source_uv_norm"],
                         kp["target_uv_norm"], kp["source_uv_warped_norm"],
                         H, W, io_net_apply, io_params, top_k=io_top_k)
            keypoint_total = keypoint_total + weights.io_loss * io
            loss_dict["io_loss"] = weights.io_loss * io
        total = total + weights.keypoint_loss * keypoint_total
        loss_dict.update(loc_loss=weights.loc_loss * kp["loc_loss"],
                         metric_loss=metric_loss,
                         usp_loss=weights.score_loss * kp["usp_loss"],
                         recall=recall)

    if flags["segmentation"]:
        seg32 = out["seg"].astype(jnp.float32)
        seg32_aug = out_aug["seg"].astype(jnp.float32)
        seg_loss = (segmentation_loss(seg32, batch["seg"]) * 0.5
                    + segmentation_loss(seg32_aug, batch["seg_aug"]) * 0.5)
        total = total + weights.segmentation_loss * seg_loss
        loss_dict["seg_loss"] = weights.segmentation_loss * seg_loss

    if flags["visloc"]:
        vlad_loss = global_descriptor_loss(
            out["vlad"].astype(jnp.float32),
            out_aug["vlad"].astype(jnp.float32))
        total = total + weights.vlad_loss * vlad_loss
        loss_dict["vlad_loss"] = weights.vlad_loss * vlad_loss

    if flags["depth"] and "depth" in out and "depth" in batch:
        d = depth_loss_fn(out["depth"], batch["depth"], weights.huber_loss)
        d = d + depth_loss_fn(out_aug["depth"], batch["depth_aug"],
                              weights.huber_loss)
        warped = homography_warp_image(out["depth"], batch["homography"],
                                       mode="nearest")
        d = d + 0.5 * jnp.mean(jnp.square(out_aug["depth"] - warped))
        total = total + weights.depth_loss * d
        loss_dict["depth_loss"] = weights.depth_loss * d

    loss_dict["total_loss"] = total
    return total, loss_dict
