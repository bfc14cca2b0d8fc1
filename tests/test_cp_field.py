"""CP-factorized spatial features (models/mlp_field.py cp_rank>0).

TensoRF-style per-axis basis vectors with linear interpolation; the
spatial-capacity complement to the freq-MLP flagship (the pure freq trunk
underfits textured scenes at the reference iteration envelope — see
docs/PERF.md round-2 quality notes)."""
import jax
import jax.numpy as jnp
import numpy as np

from sanerf_hq_tpu.models import make_field
from sanerf_hq_tpu.render import RenderSettings, render_rays
import flax.linen as nn


def _field(rank=8, res=32):
    return make_field("mlp", grid_bound=2.0, cp_rank=rank, cp_res=res,
                      hidden=32, num_layers=2, freq_degree=4,
                      prop_hidden=16, prop_layers=2, prop_freq_degree=2)


def test_cp_features_match_numpy_reference():
    m = _field()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                    jnp.ones((4, 3)))
    rng = np.random.default_rng(0)
    xn = rng.uniform(-1, 1, (64, 3)).astype(np.float32)

    g = m.apply(params, jnp.asarray(xn), method=lambda f, x: f.cp_features(x))

    S = 32
    basis = [np.asarray(params["params"][f"cp_{a}"]) for a in "xyz"]
    p = np.clip((xn + 1) / 2, 0, 1) * (S - 1)
    i0 = np.clip(np.floor(p).astype(int), 0, S - 2)
    f = p - i0
    ref = np.ones((64, 8), np.float32)
    for a in range(3):
        La = (basis[a][i0[:, a]] * (1 - f[:, a, None])
              + basis[a][i0[:, a] + 1] * f[:, a, None])
        ref = ref * La
    assert np.abs(np.asarray(g) - ref).max() < 1e-5


def test_cp_gradients_flow_and_render_works():
    m = _field()
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((4, 3)),
                    jnp.ones((4, 3)))
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    rd = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    s = RenderSettings(num_steps=(8, 4), use_contract=True, min_near=0.2,
                       background="last_sample", bound=2.0, perturb=False,
                       training=True, compute_losses=False)

    def loss(p):
        out = nn.apply(lambda f, *a, **k: render_rays(f, *a, **k), m)(
            p, ro, rd, s, key=jax.random.PRNGKey(2))
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(params)
    for a in "xyz":
        gmax = float(jnp.abs(g["params"][f"cp_{a}"]).max())
        assert np.isfinite(gmax) and gmax > 0.0, f"cp_{a} got no gradient"
