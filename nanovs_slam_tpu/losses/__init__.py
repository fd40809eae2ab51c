from .keypoint import (descriptor_loss, keypoint_losses,  # noqa: F401
                       warp_coords_homography)
from .segmentation import cross_entropy_loss, dice_loss, segmentation_loss  # noqa: F401
from .triplet import hard_triplet_loss, pairwise_distance  # noqa: F401
from .depth import silog_loss, huber_loss, depth_loss  # noqa: F401
