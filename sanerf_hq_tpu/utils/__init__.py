from .cache import Cache
from .points import load_point_file, project_points_to_view, PointPrompts
from .overlays import overlay_mask, overlay_point, overlay_mask_heatmap
