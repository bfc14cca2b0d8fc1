from .trunc_exp import trunc_exp
from .encoding import get_encoder
from .sh import sh_encode, sh_output_dim
from .freq import freq_encode, freq_output_dim
from .contraction import contract, uncontract
from .ray import near_far_from_aabb, spacing_fn, spacing_fn_inv, sample_pdf
from .composite import (
    compute_weights,
    eff_distloss,
    distort_loss,
    proposal_loss,
    loss_interlevel,
)
from .hashgrid import (
    HashGridSpec,
    init_hash_table,
    hash_encode,
    hash_encode_unit,
    total_variation_loss,
    weight_decay_loss,
)
