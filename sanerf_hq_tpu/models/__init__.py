from .mlp import MLP, SkipConnMLP
from .fields import (
    SANeRFField,
    main_grid_spec,
    feature_grid_spec,
    prop_grid_spec,
    GEOM_FEAT_DIM,
    SH_DIM,
    SAM_OUTPUT_DIM,
)
