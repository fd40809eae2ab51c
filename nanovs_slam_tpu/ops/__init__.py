from .grid import image_grid, decode_coords, remove_border  # noqa: F401
from .grid_sample import grid_sample_bilinear, grid_sample_nearest, sample_descriptors  # noqa: F401
from .postprocess import post_process, top_k_keypoints  # noqa: F401
