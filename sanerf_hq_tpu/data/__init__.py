from .rays import (
    dirs_from_pixels,
    rays_from_pixels,
    full_frame_rays,
    sample_random_pixels,
    sample_error_map_pixels,
    sample_patch_pixels,
    coarse_inds_from_fine,
)
from .sampler import sample_rgb_batch
from .synthetic import make_synthetic_dataset, look_at_pose, render_gt_sphere
