from .camera import PinholeCamera  # noqa: F401
from .groundtruth import KittiVideoGroundTruth  # noqa: F401
from .matcher import ratio_test_match_one_to_one, knn2  # noqa: F401
from .pose import (calculate_error_stats, calculate_pose_error,  # noqa: F401
                   calculate_relative_error, estimate_pose)
from .frontend import KP2DTinyFrontend  # noqa: F401
from .visual_odometry import VisualOdometry  # noqa: F401
