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


def test_fused_training_matches_composable(field_and_rays, monkeypatch):
    """Training render (custom-VJP megakernels incl. the folded prop
    resampling): forward outputs, losses, AND parameter gradients must
    match the composable path."""
    model, params, ro, rd = field_and_rays
    settings = RenderSettings(num_steps=(8, 8, 8), bound=4.0,
                              min_near=0.05, perturb=False, training=True,
                              compute_losses=True)

    def loss_fn(p):
        out = model.apply(p, ro, rd, settings,
                          method=lambda m, o, d, s: render_rays(m, o, d, s))
        loss = (jnp.mean((out["image"] - 0.3) ** 2)
                + 0.01 * out["proposal_loss"]
                + 0.001 * jnp.mean(out["distort_loss"]))
        return loss, out

    (l_ref, out_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)

    monkeypatch.setattr(fm, "PALLAS_ENABLED", True)
    monkeypatch.setattr(rlp, "INTERPRET", True)
    monkeypatch.setattr(rlp, "R_TILE", N)
    monkeypatch.setattr(rlp, "R_TILE_TRAIN", N)
    monkeypatch.setattr(rlp, "R_TILE_BWD", N)
    monkeypatch.setattr(rlp, "R_TILE_BWD_FINAL", N)
    (l_got, out_got), g_got = jax.value_and_grad(loss_fn, has_aux=True)(params)

    assert abs(float(l_got) - float(l_ref)) < 2e-2, (l_got, l_ref)
    for k in ("image", "depth", "weights_sum"):
        d = np.max(np.abs(np.asarray(out_got[k]) - np.asarray(out_ref[k])))
        assert d < 2e-2, f"{k}: {d}"

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_got))
    for path, a in flat_ref:
        b = flat_got[path]
        denom = max(float(jnp.max(jnp.abs(a))), 1e-6)
        rel = float(jnp.max(jnp.abs(jnp.asarray(b) - a))) / denom
        assert rel < 6e-2, f"grad mismatch at {path}: rel {rel}"
