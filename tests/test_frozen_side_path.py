"""Frozen-backbone side-output render path (stage-2/3) vs the composable
XLA renderer (CPU, Pallas interpret mode).

Stages 2 and 3 freeze the NeRF backbone (reference main.py:249-256), so the
renderer routes return_feats / return_mask through the stop-gradient
inference megakernels (RenderSettings.frozen_backbone) and keeps only the
s_grid/m_grid + samvit/mask-MLP branch differentiable.  These tests force
that route in interpret mode and check forward outputs, losses, and the
gradients of every TRAINABLE leaf against the fully-composable oracle —
backbone leaves legitimately differ (zero vs frozen-but-computed) and are
excluded, exactly as the optimizer freeze mask excludes them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sanerf_hq_tpu.ops.fused_mlp as fm
import sanerf_hq_tpu.ops.render_level_pallas as rlp
from sanerf_hq_tpu.models.mlp_field import MLPField
from sanerf_hq_tpu.render.renderer import RenderSettings, render_rays

N = 64

# heads trained in stages 2/3 (+ view_mlp, whose gradient flows through the
# composited feature image identically on both paths)
TRAINABLE = ("cp_s_", "cp_m_", "samvit", "mask_mlp", "view_mlp")


def _make(mask_mlp_type="default"):
    model = MLPField(grid_bound=2.0, hidden=64, num_layers=2,
                     freq_degree=4, prop_hidden=32, prop_layers=2,
                     prop_freq_degree=3, cp_rank=4, cp_res=16,
                     with_sam=True, with_mask=True, n_inst=3,
                     mask_mlp_type=mask_mlp_type,
                     feat_rep="cp", feat_rank=8, feat_res=16)
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 0.5
    rd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    return model, params, ro, rd


def _patch_fused(monkeypatch):
    monkeypatch.setattr(fm, "PALLAS_ENABLED", True)
    monkeypatch.setattr(rlp, "INTERPRET", True)
    monkeypatch.setattr(rlp, "R_TILE", N)
    # frozen final kernel tiles at R_TILE_TRAIN//2 when cp_rank > 0
    monkeypatch.setattr(rlp, "R_TILE_TRAIN", 2 * N)


def _trainable_grads(g):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        name = jax.tree_util.keystr(path)
        if any(t in name for t in TRAINABLE):
            out[name] = np.asarray(leaf)
    return out


def _check_grads(g_ref, g_got):
    ref = _trainable_grads(g_ref)
    got = _trainable_grads(g_got)
    assert set(ref) == set(got) and ref, sorted(ref)
    for name, a in ref.items():
        b = got[name]
        denom = max(float(np.max(np.abs(a))), 1e-6)
        rel = float(np.max(np.abs(b - a))) / denom
        assert rel < 6e-2, f"grad mismatch at {name}: rel {rel}"


def test_frozen_distill_step_matches_composable(monkeypatch):
    """Stage-2 shape: MSE on samvit from return_feats."""
    model, params, ro, rd = _make()
    settings = RenderSettings(num_steps=(8, 8, 8), bound=4.0, min_near=0.05,
                              perturb=False, training=True,
                              return_feats=True, frozen_backbone=True)
    target = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, 256)), jnp.float32)

    def loss_fn(p):
        out = model.apply(p, ro, rd, settings,
                          method=lambda m, o, d, s: render_rays(m, o, d, s))
        return jnp.mean((out["samvit"] - target) ** 2), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    _patch_fused(monkeypatch)
    (l_got, out_got), g_got = jax.value_and_grad(loss_fn, has_aux=True)(params)

    assert abs(float(l_got) - float(l_ref)) < 2e-2, (l_got, l_ref)
    for k in ("samvit", "image", "depth", "weights_sum"):
        d = np.max(np.abs(np.asarray(out_got[k]) - np.asarray(out_ref[k])))
        assert d < 3e-2, f"{k}: {d}"
    _check_grads(g_ref, g_got)


@pytest.mark.parametrize("mask_mlp_type", ["default", "lightweight"])
def test_frozen_mask_step_matches_composable(monkeypatch, mask_mlp_type):
    """Stage-3 shape: CE on instance_mask_logits from return_mask (both
    mask MLP variants — 'lightweight' exercises the in-renderer rebuild of
    per-sample colors from the kernel's geo output)."""
    model, params, ro, rd = _make(mask_mlp_type)
    settings = RenderSettings(num_steps=(8, 8, 8), bound=4.0, min_near=0.05,
                              perturb=False, training=True,
                              return_mask=True, frozen_backbone=True)
    gt = jnp.asarray(np.random.default_rng(2).integers(0, 3, N))

    def loss_fn(p):
        out = model.apply(p, ro, rd, settings,
                          method=lambda m, o, d, s: render_rays(m, o, d, s))
        logp = jax.nn.log_softmax(out["instance_mask_logits"], axis=-1)
        ce = -jnp.mean(jnp.take_along_axis(logp, gt[:, None], axis=-1))
        return ce, out

    (l_ref, out_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    _patch_fused(monkeypatch)
    (l_got, out_got), g_got = jax.value_and_grad(loss_fn, has_aux=True)(params)

    assert abs(float(l_got) - float(l_ref)) < 2e-2, (l_got, l_ref)
    for k in ("instance_mask_logits", "image", "depth"):
        d = np.max(np.abs(np.asarray(out_got[k]) - np.asarray(out_ref[k])))
        assert d < 3e-2, f"{k}: {d}"
    _check_grads(g_ref, g_got)


def test_frozen_eval_feats_matches_composable(monkeypatch):
    """Eval-time side-output render (decode path: return_feats, no
    training) also routes through the frozen megakernels."""
    model, params, ro, rd = _make()
    settings = RenderSettings(num_steps=(8, 8, 8), bound=4.0, min_near=0.05,
                              perturb=False, training=False,
                              return_feats=True, return_mask=True)

    def run():
        return model.apply(params, ro, rd, settings,
                           method=lambda m, o, d, s: render_rays(m, o, d, s))

    ref = run()
    _patch_fused(monkeypatch)
    got = run()
    for k in ("samvit", "instance_mask_logits", "image", "depth",
              "weights_sum"):
        d = np.max(np.abs(np.asarray(got[k]) - np.asarray(ref[k])))
        assert d < 3e-2, f"{k}: {d}"
