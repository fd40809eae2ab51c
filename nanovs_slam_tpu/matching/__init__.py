from .lightglue import LightGlue, LightGlueConfig, filter_matches, normalize_keypoints  # noqa: F401
from .configs import LIGHTGLUE_CONFIGS  # noqa: F401
