from .homography import sample_homography, homography_warp_image, warp_image_batch  # noqa: F401
