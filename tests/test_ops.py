"""Unit tests for the op layer against independent numpy oracles
(SURVEY.md §4 test strategy, layer 1)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_hq_tpu.ops import (
    contract,
    uncontract,
    trunc_exp,
    sh_encode,
    freq_encode,
    near_far_from_aabb,
    spacing_fn,
    spacing_fn_inv,
    sample_pdf,
    compute_weights,
    distort_loss,
    proposal_loss,
)


def test_trunc_exp_forward_and_grad():
    x = jnp.array([-20.0, -1.0, 0.0, 1.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_sh_degree4_values():
    # hand-evaluated real SH at a fixed direction
    d = np.array([0.3, -0.4, 0.866025], dtype=np.float32)
    d = d / np.linalg.norm(d)
    out = np.asarray(sh_encode(jnp.asarray(d)[None], degree=4))[0]
    assert out.shape == (16,)
    x, y, z = d
    np.testing.assert_allclose(out[0], 0.28209479177387814, rtol=1e-6)
    np.testing.assert_allclose(out[1], -0.48860251190291987 * y, rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.48860251190291987 * z, rtol=1e-5)
    np.testing.assert_allclose(out[3], -0.48860251190291987 * x, rtol=1e-5)
    np.testing.assert_allclose(out[4], 1.0925484305920792 * x * y, rtol=1e-5)
    np.testing.assert_allclose(
        out[6], 0.94617469575755997 * z * z - 0.31539156525251999, rtol=1e-5
    )
    np.testing.assert_allclose(
        out[9], 0.59004358992664352 * y * (-3 * x * x + y * y), rtol=1e-4
    )


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_sh_orthonormality(degree):
    # Monte-Carlo check that the basis is orthonormal on the sphere:
    # E[4*pi * Y_i Y_j] ~= delta_ij
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3)).astype(np.float32)
    ys = np.asarray(sh_encode(jnp.asarray(d), degree=degree))
    gram = 4 * np.pi * ys.T @ ys / ys.shape[0]
    np.testing.assert_allclose(gram, np.eye(degree ** 2), atol=0.08)


def test_freq_encode_layout():
    x = jnp.array([[0.5, -1.0]])
    out = np.asarray(freq_encode(x, degree=2))
    assert out.shape == (1, 2 * (1 + 2 * 2))
    # per-channel layout: [x, sin(x), cos(x), sin(2x), cos(2x)]
    np.testing.assert_allclose(
        out[0, :5],
        [0.5, math.sin(0.5), math.cos(0.5), math.sin(1.0), math.cos(1.0)],
        rtol=1e-6,
    )
    np.testing.assert_allclose(out[0, 5], -1.0, rtol=1e-6)


def test_contract_roundtrip_and_bounds():
    rng = np.random.default_rng(1)
    x = rng.uniform(-50, 50, size=(4096, 3)).astype(np.float32)
    z = np.asarray(contract(jnp.asarray(x)))
    assert np.all(np.abs(z) <= 2.0 + 1e-5)
    # inside unit inf-ball: identity
    xin = rng.uniform(-0.99, 0.99, size=(128, 3)).astype(np.float32)
    np.testing.assert_allclose(contract(jnp.asarray(xin)), xin, rtol=1e-6)
    # roundtrip
    x_rt = np.asarray(uncontract(jnp.asarray(z)))
    np.testing.assert_allclose(x_rt, x, rtol=2e-3, atol=2e-3)


def test_near_far_from_aabb():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    rays_o = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 3.0], [5.0, 5.0, 3.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    near, far = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.05)
    np.testing.assert_allclose(near[0, 0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(far[0, 0], 4.0, rtol=1e-5)
    # pointing away: reference slab test does NOT flag this as a miss
    # (both hits behind origin); near gets clamped to min_near
    np.testing.assert_allclose(near[1, 0], 0.05, rtol=1e-5)
    np.testing.assert_allclose(far[1, 0], -2.0, rtol=1e-5)
    # parallel outside slab -> miss -> 1e9
    assert near[2, 0] >= 1e8


def test_spacing_roundtrip():
    t = jnp.array([0.05, 0.5, 1.0, 2.0, 100.0])
    s = spacing_fn(t)
    np.testing.assert_allclose(spacing_fn_inv(s), t, rtol=1e-5)
    assert np.all(np.asarray(s) >= 0) and np.all(np.asarray(s) <= 1)


def _sample_pdf_oracle(bins, weights, T):
    # independent numpy transcription of nerf/renderer.py:84-119 semantics
    N, T0 = weights.shape
    w = weights + 0.01
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.minimum(np.cumsum(pdf, -1), 1.0)
    cdf = np.concatenate([np.zeros((N, 1)), cdf], -1)
    u = np.linspace(0.5 / T, 1 - 0.5 / T, T)
    u = np.broadcast_to(u, (N, T))
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right") for i in range(N)])
    below = np.clip(inds - 1, 0, T0)
    above = np.clip(inds, 0, T0)
    cdf0 = np.take_along_axis(cdf, below, -1)
    cdf1 = np.take_along_axis(cdf, above, -1)
    b0 = np.take_along_axis(bins, below, -1)
    b1 = np.take_along_axis(bins, above, -1)
    denom = cdf1 - cdf0
    t = np.clip(np.nan_to_num(np.where(denom > 0, (u - cdf0) / np.where(denom > 0, denom, 1), 0)), 0, 1)
    return b0 + t * (b1 - b0)


def test_sample_pdf_matches_oracle():
    rng = np.random.default_rng(2)
    N, T0, T = 64, 128, 65
    bins = np.sort(rng.uniform(0, 1, size=(N, T0 + 1)), axis=-1)
    weights = rng.uniform(0, 1, size=(N, T0)).astype(np.float64)
    ours = np.asarray(sample_pdf(jnp.asarray(bins, jnp.float32),
                                 jnp.asarray(weights, jnp.float32), T))
    oracle = _sample_pdf_oracle(bins, weights, T)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)
    # output monotone within each row
    assert np.all(np.diff(ours, axis=-1) >= -1e-6)


def test_compute_weights_opaque_last():
    deltas = jnp.ones((4, 16)) * 0.1
    sigmas = jnp.ones((4, 16)) * 0.5
    w, trans = compute_weights(deltas, sigmas, opaque_last=True)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    # without opaque last, sum < 1
    w2, _ = compute_weights(deltas, sigmas, opaque_last=False)
    assert np.all(np.asarray(w2).sum(-1) < 1.0)
    # brute-force check one ray
    ds = np.full(16, 0.05)
    alphas = 1 - np.exp(-ds)
    T = np.exp(-np.concatenate([[0], np.cumsum(ds)[:-1]]))
    wb, _ = compute_weights(jnp.full((1, 16), 0.1), jnp.full((1, 16), 0.5),
                            opaque_last=False)
    np.testing.assert_allclose(np.asarray(wb)[0], alphas * T, rtol=1e-5)


def test_distort_loss_matches_quadratic_form():
    rng = np.random.default_rng(3)
    N, T = 8, 32
    bins = np.sort(rng.uniform(0, 1, size=(N, T + 1)), axis=-1).astype(np.float32)
    w = rng.uniform(0, 0.1, size=(N, T)).astype(np.float32)
    ours = float(distort_loss(jnp.asarray(bins), jnp.asarray(w)))
    itv = bins[:, 1:] - bins[:, :-1]
    mid = bins[:, :-1] + itv / 2
    # O(T^2) definition
    per_ray = []
    for i in range(N):
        mm = np.abs(mid[i][:, None] - mid[i][None, :])
        bi = np.sum(w[i][:, None] * w[i][None, :] * mm)
        uni = np.sum(w[i] ** 2 * itv[i]) / 3
        per_ray.append(bi + uni)
    np.testing.assert_allclose(ours, np.mean(per_ray), rtol=1e-4)


def test_proposal_loss_zero_when_matching():
    # proposal == final distribution -> loss ~ 0
    rng = np.random.default_rng(4)
    N, T = 16, 32
    bins = np.sort(rng.uniform(0, 1, size=(N, T + 1)), axis=-1).astype(np.float32)
    w = rng.uniform(0, 1, size=(N, T)).astype(np.float32)
    loss = float(proposal_loss([jnp.asarray(bins), jnp.asarray(bins)],
                               [jnp.asarray(w), jnp.asarray(w)]))
    assert loss < 1e-5
    # proposal that underestimates mass everywhere -> positive loss
    loss2 = float(proposal_loss([jnp.asarray(bins), jnp.asarray(bins)],
                                [jnp.asarray(w) * 0.0, jnp.asarray(w)]))
    assert loss2 > 0.0
