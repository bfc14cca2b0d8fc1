"""Interpret-mode tests of the Pallas level megakernels (fwd + custom VJP).

The real kernels run on TPU only (Mosaic); here pallas interpret mode runs
the SAME kernel python on CPU against a pure-jnp twin of the level math
(the same math render/renderer.py's composable path uses).  This guards
the kernel/VJP algebra — grouped sample batching, closed-form compositing
backward, relu-mask-from-inputs — in CI; the TPU lowering itself is
checked on hardware by scripts/check_fused_train_grads.py.

Reference semantics under test: fixed-shape proposal rendering
(/root/reference/nerf/renderer.py:261-330) with opaque-last-sample
compositing (:308-325).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sanerf_hq_tpu.ops.render_level_pallas as rlp

N, T = 256, 8
STATIC_F = (10, 2, 128.0, True, -1.5)  # freq_deg, skip, bound, opaque, density_bias
STATIC_P = (6, 128.0, True, -1.5)


@pytest.fixture(autouse=True)
def _interpret_small_tiles(monkeypatch):
    monkeypatch.setattr(rlp, "INTERPRET", True)
    monkeypatch.setattr(rlp, "R_TILE", 256)
    monkeypatch.setattr(rlp, "R_TILE_TRAIN", 256)
    monkeypatch.setattr(rlp, "R_TILE_BWD", 256)
    monkeypatch.setattr(rlp, "R_TILE_BWD_FINAL", 256)


@pytest.fixture()
def rays():
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 2
    rd = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    bins = jnp.asarray(np.sort(rng.uniform(0.2, 4.0, (N, T + 1)), axis=1),
                       jnp.float32)
    sh = jnp.asarray(rng.normal(size=(N, 16)), jnp.float32)
    return ro, rd, bins, sh


def _contract(xyz, bound):
    ax = jnp.abs(xyz)
    mag = jnp.max(ax, axis=-1, keepdims=True)
    inv = 1.0 / jnp.maximum(mag, 1e-38)
    scale = jnp.where(ax == mag, (2.0 - inv) * inv, inv)
    return jnp.where(mag < 1.0, xyz, xyz * scale) / bound


def _mlp(xyz, ws, degree, skip):
    f = jnp.concatenate([xyz * (2.0 ** k) for k in range(degree)], -1)
    h = jnp.concatenate([xyz, jnp.sin(f), jnp.cos(f)], -1).astype(jnp.bfloat16)
    h_in = h
    for l, w in enumerate(ws):
        if l == skip:
            h = jnp.concatenate([h, h_in], -1)
        h = jnp.dot(h, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if l != len(ws) - 1:
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return h


def _composite(h, bins, opaque_last, db):
    t = (bins[:, 1:] + bins[:, :-1]) / 2
    delta = bins[:, 1:] - bins[:, :-1]
    sigma = jnp.exp(jnp.clip(h[..., 0] + db, -30, 15))
    ds = delta * sigma
    if opaque_last:
        ds = ds.at[:, -1].set(jnp.inf)
    alpha = 1 - jnp.exp(-ds)
    trans = jnp.exp(-jnp.cumsum(jnp.pad(ds[:, :-1], ((0, 0), (1, 0))), -1))
    return alpha * trans, t


def ref_final(ro, rd, bins, sh, ws, static):
    degree, skip, bound, opaque, db = static
    t_mid = (bins[:, 1:] + bins[:, :-1]) / 2
    xyz = _contract(ro[:, None] + rd[:, None] * t_mid[..., None], bound)
    h = _mlp(xyz, ws, degree, skip)
    w_s, t = _composite(h, bins, opaque, db)
    color = jnp.concatenate([h[..., 1:], jnp.tile(sh[:, None], (1, T, 1))], -1)
    return (jnp.sum(w_s[..., None] * color, 1), jnp.sum(w_s * t, 1),
            jnp.sum(w_s, 1), w_s)


def ref_prop(ro, rd, bins, ws, static):
    degree, bound, opaque, db = static
    t_mid = (bins[:, 1:] + bins[:, :-1]) / 2
    xyz = _contract(ro[:, None] + rd[:, None] * t_mid[..., None], bound)
    h = _mlp(xyz, ws, degree, -1)
    w_s, _ = _composite(h, bins, opaque, db)
    return w_s


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


def test_final_level_forward_and_vjp(rays):
    ro, rd, bins, sh = rays
    rng = np.random.default_rng(1)
    ws = tuple(jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
               for s in [(63, 256), (256, 256), (319, 256), (256, 16)])

    out_k = rlp.final_level_train(STATIC_F, ro, rd, bins, sh, *ws)
    out_r = ref_final(ro, rd, bins, sh, list(ws), STATIC_F)
    for name, a, b in zip(("f_img", "depth", "wsum", "weights"), out_k, out_r):
        assert _rel(a, b) < 2e-2, name

    def loss(fn):
        def f(ws_):
            fi, d, w, ww = fn(ws_)
            return (jnp.sum(fi ** 2) + 0.1 * jnp.sum(d) + 0.01 * jnp.sum(w)
                    + jnp.sum(ww ** 2))
        return f

    gk = jax.grad(loss(lambda w_: rlp.final_level_train(
        STATIC_F, ro, rd, bins, sh, *w_)))(ws)
    gr = jax.grad(loss(lambda w_: ref_final(
        ro, rd, bins, sh, list(w_), STATIC_F)))(ws)
    for i, (a, b) in enumerate(zip(gk, gr)):
        assert _rel(a, b) < 2e-2, f"dW{i}"


def test_prop_level_forward_and_vjp(rays):
    ro, rd, bins, _ = rays
    rng = np.random.default_rng(2)
    ws = tuple(jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
               for s in [(39, 64), (64, 64), (64, 1)])

    w_k = rlp.prop_level_train(STATIC_P, ro, rd, bins, *ws)
    w_r = ref_prop(ro, rd, bins, list(ws), STATIC_P)
    assert _rel(w_k, w_r) < 2e-2

    gk = jax.grad(lambda w_: jnp.sum(rlp.prop_level_train(
        STATIC_P, ro, rd, bins, *w_) ** 2))(ws)
    gr = jax.grad(lambda w_: jnp.sum(ref_prop(
        ro, rd, bins, list(w_), STATIC_P) ** 2))(ws)
    for i, (a, b) in enumerate(zip(gk, gr)):
        assert _rel(a, b) < 2e-2, f"prop dW{i}"


def test_prop_level_folded_sample_pdf(rays):
    """fused_prop_level_sample == fused_prop_level -> ops/ray.sample_pdf
    (the XLA masked-reduction path): the in-kernel raw-cumsum lookup must
    reproduce the normalized-cdf resampling bin-for-bin."""
    from sanerf_hq_tpu.ops.ray import sample_pdf

    ro, rd, bins, _ = rays
    rng = np.random.default_rng(4)
    ws = [jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
          for s in [(39, 64), (64, 64), (64, 1)]]
    deg, bound, opq, db = STATIC_P
    # s-space edges of this level: monotone in [0, 1] per ray
    s_bins = jnp.asarray(
        np.sort(rng.uniform(0.0, 1.0, (N, T + 1)), axis=1), jnp.float32)
    Q = 9
    u = jnp.linspace(0.5 / Q, 1.0 - 0.5 / Q, Q, dtype=jnp.float32)
    u = jnp.broadcast_to(u, (N, Q))
    u = u + jnp.asarray(rng.uniform(-0.4 / Q, 0.4 / Q, (N, Q)), jnp.float32)

    got = rlp.fused_prop_level_sample(
        ro, rd, bins, s_bins, u, ws, deg, bound,
        opaque_last=opq, density_bias=db)

    weights = rlp.fused_prop_level(
        ro, rd, bins, ws, deg, bound, opaque_last=opq, density_bias=db)
    # reproduce sample_pdf's exact query stream by monkey-free injection:
    # sample_pdf builds cdf from (weights + 0.01) and runs the masked
    # prefix/suffix lookup on s_bins
    w = weights + 0.01
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.minimum(jnp.cumsum(pdf, axis=-1), 1.0)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    le = cdf[:, None, :] <= u[:, :, None]
    neg, pos = jnp.float32(-1e38), jnp.float32(1e38)
    cdf_g0 = jnp.max(jnp.where(le, cdf[:, None, :], neg), axis=-1)
    bins_g0 = jnp.max(jnp.where(le, s_bins[:, None, :], neg), axis=-1)
    cdf_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, cdf[:, None, :]), axis=-1), cdf[:, -1:])
    bins_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, s_bins[:, None, :]), axis=-1),
        s_bins[:, -1:])
    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0),
                  0.0)
    want = bins_g0 + jnp.clip(t, 0.0, 1.0) * (bins_g1 - bins_g0)

    assert got.shape == (N, Q)
    # monotone edges out
    assert float(jnp.min(jnp.diff(got, axis=-1))) >= -1e-5
    assert float(jnp.max(jnp.abs(got - want))) < 5e-3


def test_prop_level_train_sample_fwd_and_vjp(rays):
    """Training twin of the fold: (weights, next_bins) must match
    (prop_level_train, ops/ray.sample_pdf), weight-grads must match the
    unfused train kernel's, and no grad may flow into s_bins/u (the
    resampled bins are detached by construction)."""
    ro, rd, bins, _ = rays
    rng = np.random.default_rng(5)
    ws = tuple(jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
               for s in [(39, 64), (64, 64), (64, 1)])
    s_bins = jnp.asarray(
        np.sort(rng.uniform(0.0, 1.0, (N, T + 1)), axis=1), jnp.float32)
    Q = 9
    u = jnp.broadcast_to(
        jnp.linspace(0.5 / Q, 1.0 - 0.5 / Q, Q, dtype=jnp.float32), (N, Q))

    w_got, nb_got = rlp.prop_level_train_sample(
        STATIC_P, ro, rd, bins, s_bins, u, *ws)
    w_ref = rlp.prop_level_train(STATIC_P, ro, rd, bins, *ws)
    assert _rel(w_got, w_ref) < 1e-5  # same kernel math, raw weights out

    # reference resampling on the reference weights (XLA sample_pdf math)
    wf = w_ref + 0.01
    pdf = wf / jnp.sum(wf, axis=-1, keepdims=True)
    cdf = jnp.minimum(jnp.cumsum(pdf, axis=-1), 1.0)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    le = cdf[:, None, :] <= u[:, :, None]
    neg, pos = jnp.float32(-1e38), jnp.float32(1e38)
    cdf_g0 = jnp.max(jnp.where(le, cdf[:, None, :], neg), axis=-1)
    bins_g0 = jnp.max(jnp.where(le, s_bins[:, None, :], neg), axis=-1)
    cdf_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, cdf[:, None, :]), axis=-1), cdf[:, -1:])
    bins_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, s_bins[:, None, :]), axis=-1),
        s_bins[:, -1:])
    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0),
                  0.0)
    nb_ref = bins_g0 + jnp.clip(t, 0.0, 1.0) * (bins_g1 - bins_g0)
    assert float(jnp.max(jnp.abs(nb_got - nb_ref))) < 5e-3

    def loss_fused(w_):
        w, _ = rlp.prop_level_train_sample(STATIC_P, ro, rd, bins, s_bins,
                                           u, *w_)
        return jnp.sum(w ** 2)

    gk = jax.grad(loss_fused)(ws)
    gr = jax.grad(lambda w_: jnp.sum(rlp.prop_level_train(
        STATIC_P, ro, rd, bins, *w_) ** 2))(ws)
    for i, (a, b) in enumerate(zip(gk, gr)):
        assert _rel(a, b) < 1e-5, f"train-sample dW{i}"

    g_sb, g_u = jax.grad(
        lambda sb, uu: jnp.sum(jnp.stack(rlp.prop_level_train_sample(
            STATIC_P, ro, rd, bins, sb, uu, *ws)[0]) ** 2),
        argnums=(0, 1))(s_bins, u)
    assert float(jnp.abs(g_sb).max()) == 0.0
    assert float(jnp.abs(g_u).max()) == 0.0


def test_grads_do_not_flow_to_rays_or_bins(rays):
    ro, rd, bins, sh = rays
    rng = np.random.default_rng(3)
    ws = tuple(jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
               for s in [(63, 256), (256, 256), (319, 256), (256, 16)])
    g = jax.grad(lambda r, b: jnp.sum(rlp.final_level_train(
        STATIC_F, r, rd, b, sh, *ws)[0] ** 2), argnums=(0, 1))(ro, bins)
    assert float(jnp.abs(g[0]).max()) == 0.0
    assert float(jnp.abs(g[1]).max()) == 0.0


# ---- CP-extended final level (cp_rank > 0 flagship) -----------------------

CP_RANK, CP_RES = 8, 32
STATIC_CP = (10, 2, 128.0, True, -1.5, CP_RANK, CP_RES)


def _cp_feats_ref(xn, cps):
    """Oracle = models/mlp_field.py cp_features (fp32 one-hot matmuls)."""
    S = CP_RES
    p = jnp.clip((xn + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, S - 2)
    f = p - i0
    iota = jnp.arange(S)
    g = None
    for a in range(3):
        W = (jnp.where(iota == i0[..., a, None], 1.0 - f[..., a, None], 0.0)
             + jnp.where(iota == i0[..., a, None] + 1, f[..., a, None], 0.0))
        La = jnp.dot(W, cps[a], preferred_element_type=jnp.float32)
        g = La if g is None else g * La
    return g


def _mlp_cp(xyz, extra, ws, degree, skip):
    f = jnp.concatenate([xyz * (2.0 ** k) for k in range(degree)], -1)
    h = jnp.concatenate([xyz, jnp.sin(f), jnp.cos(f),
                         extra.astype(jnp.float32)], -1).astype(jnp.bfloat16)
    h_in = h
    for l, w in enumerate(ws):
        if l == skip:
            h = jnp.concatenate([h, h_in], -1)
        h = jnp.dot(h, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if l != len(ws) - 1:
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return h


def ref_final_cp(ro, rd, bins, sh, ws, cps, static):
    degree, skip, bound, opaque, db = static[:5]
    t_mid = (bins[:, 1:] + bins[:, :-1]) / 2
    xyz = _contract(ro[:, None] + rd[:, None] * t_mid[..., None], bound)
    h = _mlp_cp(xyz, _cp_feats_ref(xyz, cps), ws, degree, skip)
    w_s, t = _composite(h, bins, opaque, db)
    color = jnp.concatenate([h[..., 1:], jnp.tile(sh[:, None], (1, T, 1))], -1)
    return (jnp.sum(w_s[..., None] * color, 1), jnp.sum(w_s * t, 1),
            jnp.sum(w_s, 1), w_s)


def test_final_level_cp_forward_and_vjp(rays):
    ro, rd, bins, sh = rays
    rng = np.random.default_rng(4)
    in0 = 63 + CP_RANK
    ws = tuple(jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
               for s in [(in0, 256), (256, 256), (256 + in0, 256), (256, 16)])
    cps = tuple(jnp.asarray(rng.normal(size=(CP_RES, CP_RANK)) * 0.3,
                            jnp.float32) for _ in range(3))

    out_k = rlp.final_level_train(STATIC_CP, ro, rd, bins, sh, *ws, *cps)
    out_r = ref_final_cp(ro, rd, bins, sh, list(ws), list(cps), STATIC_CP)
    for name, a, b in zip(("f_img", "depth", "wsum", "weights"), out_k, out_r):
        assert _rel(a, b) < 2e-2, name

    def loss(fn):
        def f(p):
            fi, d, w, ww = fn(p)
            return (jnp.sum(fi ** 2) + 0.1 * jnp.sum(d) + 0.01 * jnp.sum(w)
                    + jnp.sum(ww ** 2))
        return f

    gk = jax.grad(loss(lambda p: rlp.final_level_train(
        STATIC_CP, ro, rd, bins, sh, *p)))(ws + cps)
    gr = jax.grad(loss(lambda p: ref_final_cp(
        ro, rd, bins, sh, list(p[:4]), list(p[4:]), STATIC_CP)))(ws + cps)
    names = [f"dW{i}" for i in range(4)] + [f"dCP{a}" for a in "xyz"]
    for n_, a, b in zip(names, gk, gr):
        assert _rel(a, b) < 2e-2, n_
