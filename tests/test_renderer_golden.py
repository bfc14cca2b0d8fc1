"""Golden-regression test of one full renderer pass (SURVEY.md §4 layer 2):
fixed seeds -> snapshot outputs.  Guards the proposal loop, contraction,
compositing, deferred color and the loss terms against silent semantic
drift in future rounds.  Snapshot generated on CPU (the ops layer is
oracle-tested, so this composite output is trusted)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sanerf_hq_tpu.models import SANeRFField
from sanerf_hq_tpu.ops import HashGridSpec
from sanerf_hq_tpu.render import RenderSettings, render_rays

SMALL = dict(
    main_spec=HashGridSpec(num_levels=4, level_dim=2, base_resolution=8,
                           log2_hashmap_size=12, desired_resolution=64),
    prop_spec_0=HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                             log2_hashmap_size=11, desired_resolution=32),
    prop_spec_1=HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                             log2_hashmap_size=11, desired_resolution=32),
)

GOLDEN_IMAGE = np.array([
    [0.496963, 0.497179, 0.505151],
    [0.501449, 0.498227, 0.500308],
    [0.507446, 0.502311, 0.503943],
])
GOLDEN_DEPTH = np.array([1.031662, 1.028379, 1.034737, 1.020252])
GOLDEN_PLOSS = 0.010075211524963379
GOLDEN_DLOSS = 0.289622962474823


def test_renderer_golden():
    model = SANeRFField(grid_bound=2.0, **SMALL)
    params = model.init(jax.random.PRNGKey(42), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    settings = RenderSettings(
        num_steps=(16, 8, 4), use_contract=True, min_near=0.05,
        background="last_sample", bound=4.0, training=True,
        compute_losses=True,
    )
    rng = np.random.default_rng(123)
    o = rng.normal(size=(8, 3))
    o = 2.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    ro = jnp.asarray(o, jnp.float32)
    rd = jnp.asarray(-o, jnp.float32)
    out = nn.apply(lambda f, *a, **k: render_rays(f, *a, **k), model)(
        params, ro, rd, settings, update_proposal=True
    )
    np.testing.assert_allclose(np.asarray(out["image"][:3]), GOLDEN_IMAGE,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"][:4]), GOLDEN_DEPTH,
                               atol=2e-3)
    # opaque-last compositing: weights always sum to 1
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(out["proposal_loss"]), GOLDEN_PLOSS,
                               rtol=1e-2)
    np.testing.assert_allclose(float(out["distort_loss"]), GOLDEN_DLOSS,
                               rtol=1e-2)
