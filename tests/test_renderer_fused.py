"""Fused inference render path vs the composable XLA renderer (CPU,
Pallas interpret mode).

The TPU inference path runs every level as a megakernel — including the
folded prop+inverse-CDF resampling (ops/render_level_pallas.
fused_prop_level_sample) — while CPU CI normally exercises only the
composable path (PALLAS_ENABLED is False off-TPU).  This test forces the
fused route through interpret mode and checks the full render output
(image / depth / weights_sum) against the composable oracle, so a break
anywhere in the fused chain (prop fold -> bins handoff -> final kernel)
is caught before hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sanerf_hq_tpu.ops.fused_mlp as fm
import sanerf_hq_tpu.ops.render_level_pallas as rlp
from sanerf_hq_tpu.models.mlp_field import MLPField
from sanerf_hq_tpu.render.renderer import RenderSettings, render_rays

N = 128


@pytest.fixture()
def field_and_rays():
    model = MLPField(grid_bound=2.0, hidden=64, num_layers=2,
                     freq_degree=4, prop_hidden=32, prop_layers=2,
                     prop_freq_degree=3, cp_rank=4, cp_res=16)
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 0.5
    rd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    return model, params, ro, rd


def test_fused_inference_matches_composable(field_and_rays, monkeypatch):
    model, params, ro, rd = field_and_rays
    settings = RenderSettings(num_steps=(8, 8, 8), bound=4.0,
                              min_near=0.05, perturb=False)

    def run():
        return model.apply(params, ro, rd, settings,
                           method=lambda m, o, d, s: render_rays(m, o, d, s))

    ref = run()  # PALLAS_ENABLED False off-TPU -> composable XLA path

    monkeypatch.setattr(fm, "PALLAS_ENABLED", True)
    monkeypatch.setattr(rlp, "INTERPRET", True)
    monkeypatch.setattr(rlp, "R_TILE", N)
    monkeypatch.setattr(rlp, "R_TILE_TRAIN", N)
    got = run()  # fused: folded prop levels + final megakernel

    for k in ("image", "depth", "weights_sum"):
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        assert a.shape == b.shape, k
        assert np.max(np.abs(a - b)) < 2e-2, (
            f"{k}: fused/composable mismatch {np.max(np.abs(a - b))}")
