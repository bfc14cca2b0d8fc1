"""--lambda_tv / --lambda_wd must actually change the grid gradient
(VERDICT r1 weak #5: flags were parsed but consumed nowhere).

Reference semantics: nerf/trainer.py:558-568 post_train_step injects TV/WD
gradients into the ACTIVE grid (nerf/network.py:189-203: sam -> s_grid,
mask -> m_grid, else main grid).  Here they are differentiable loss terms
(ops/hashgrid.py) added inside the jitted steps."""
import jax
import jax.numpy as jnp
import numpy as np

from sanerf_hq_tpu.config import Config
from sanerf_hq_tpu.models import SANeRFField
from sanerf_hq_tpu.models.fields import active_reg_grid
from sanerf_hq_tpu.ops import HashGridSpec
from sanerf_hq_tpu.ops.hashgrid import weight_decay_loss
from sanerf_hq_tpu.train.state import create_train_state
from sanerf_hq_tpu.train.steps import _grid_regularizers, make_rgb_train_step

TINY_MAIN = HashGridSpec(input_dim=3, num_levels=3, level_dim=2,
                         base_resolution=8, log2_hashmap_size=10,
                         desired_resolution=32)
TINY_PROP = HashGridSpec(input_dim=3, num_levels=2, level_dim=2,
                         base_resolution=8, log2_hashmap_size=9,
                         desired_resolution=16)


def _tiny_model():
    return SANeRFField(grid_bound=2.0, main_spec=TINY_MAIN,
                       prop_spec_0=TINY_PROP, prop_spec_1=TINY_PROP)


def test_active_reg_grid_dispatch():
    m = _tiny_model()
    name, spec = active_reg_grid(m, "rgb")
    assert name == "grid" and spec == TINY_MAIN
    m_sam = SANeRFField(grid_bound=2.0, with_sam=True, main_spec=TINY_MAIN,
                        feat_spec=TINY_MAIN, prop_spec_0=TINY_PROP,
                        prop_spec_1=TINY_PROP)
    assert active_reg_grid(m_sam, "sam")[0] == "s_grid"
    m_mask = SANeRFField(grid_bound=2.0, with_mask=True, main_spec=TINY_MAIN,
                         feat_spec=TINY_MAIN, prop_spec_0=TINY_PROP,
                         prop_spec_1=TINY_PROP)
    assert active_reg_grid(m_mask, "mask")[0] == "m_grid"
    # no s_grid when the stage's field is absent
    assert active_reg_grid(m, "sam") is None
    # MLP flagship has no hash table at all
    from sanerf_hq_tpu.models import make_field
    assert active_reg_grid(make_field("mlp", grid_bound=2.0), "rgb") is None


def test_reg_loss_grad_on_grid_only():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.ones((2, 3)))
    cfg = Config(lambda_tv=0.5, lambda_wd=0.25)
    reg = _grid_regularizers(model, cfg, "rgb")
    assert reg is not None
    g = jax.grad(lambda p: reg(p, jax.random.PRNGKey(1)))(params)
    grid_g = np.asarray(g["params"]["grid"])
    assert np.any(grid_g != 0.0), "TV/WD produced zero gradient on the grid"
    # WD analytic check: grad of wd alone is 2*table/level_size
    cfg_wd = Config(lambda_wd=1.0)
    reg_wd = _grid_regularizers(model, cfg_wd, "rgb")
    g_wd = jax.grad(lambda p: reg_wd(p, jax.random.PRNGKey(1)))(params)
    table = np.asarray(params["params"]["grid"])
    expect = np.zeros_like(table)
    for res, offset, size, use_hash in TINY_MAIN.level_meta():
        expect[offset:offset + size] = 2.0 * table[offset:offset + size] / size
    np.testing.assert_allclose(np.asarray(g_wd["params"]["grid"]), expect,
                               rtol=1e-5, atol=1e-8)
    # other params untouched by the reg term
    assert np.all(np.asarray(g_wd["params"]["prop_grid_0"]) == 0.0)


def test_lambda_flags_change_training():
    """Same state, same batch, same key: lambda_wd>0 must move the grid
    differently while leaving the reg-free params identical pre-Adam-noise."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.ones((2, 3)))

    n = 32
    rng = np.random.default_rng(0)
    batch = {
        "rays_o": jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        "rays_d": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        "gt_rgb": jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        "step": jnp.asarray(0, jnp.int32),
    }
    cfg0 = Config(num_steps=(8, 4, 2), num_rays=n, bound=4.0, min_near=0.05,
                  lambda_distort=0.0)
    cfg1 = Config(num_steps=(8, 4, 2), num_rays=n, bound=4.0, min_near=0.05,
                  lambda_distort=0.0, lambda_wd=10.0, lambda_tv=1.0)

    outs = {}
    for tag, cfg in (("off", cfg0), ("on", cfg1)):
        state = create_train_state(params, base_lr=1e-2, total_iters=10)
        step = make_rgb_train_step(model, cfg, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        outs[tag] = (new_state, metrics)

    m_off, m_on = outs["off"][1], outs["on"][1]
    assert float(m_on["loss"]) > float(m_on["mse"]), "reg term missing from loss"
    g_off = np.asarray(outs["off"][0].params["params"]["grid"])
    g_on = np.asarray(outs["on"][0].params["params"]["grid"])
    assert not np.allclose(g_off, g_on), "lambda_tv/wd had no effect on grid"


def test_weight_decay_loss_value():
    spec = TINY_MAIN
    table = jnp.ones((spec.total_params, spec.level_dim))
    val = float(weight_decay_loss(table, spec))
    # each level contributes sum(1^2)/size = level_dim exactly
    assert np.isclose(val, spec.num_levels * spec.level_dim)
