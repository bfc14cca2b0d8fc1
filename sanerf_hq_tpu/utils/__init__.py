from .cache import Cache
from .points import load_point_file, project_points_to_view, PointPrompts
from .overlays import (
    overlay_mask,
    overlay_point,
    overlay_mask_heatmap,
    overlay_mask_only,
    overlay_mask_composition,
    get_incoherent_mask,
)
from .profiling import device_time, mrays_per_sec, trace, seed_everything
