from .mlp import MLP, SkipConnMLP
from .mlp_field import MLPField, FreqMLP, make_field
from .fields import (
    SANeRFField,
    main_grid_spec,
    feature_grid_spec,
    prop_grid_spec,
    GEOM_FEAT_DIM,
    SH_DIM,
    SAM_OUTPUT_DIM,
)
