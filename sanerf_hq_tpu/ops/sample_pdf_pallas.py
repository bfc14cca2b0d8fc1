"""Pallas TPU kernel for inverse-CDF resampling (sample_pdf hot path).

The XLA formulation materializes [N, Q, K] broadcast compares (~6 ms per
65K-ray level).  This kernel puts rays on the LANE axis and makes ONE pass
over the K cdf entries, accumulating the searchsorted count and all four
prefix/suffix lookups in registers — O(K) sweeps of [Q, TILE] vregs.

Gradients: the renderer stop-gradients sample_pdf's output (the reference
detaches it, nerf/renderer.py:273-274), so the kernel is forward-only; the
jnp fallback in ops/ray.py remains the differentiable/CPU path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def _kernel(cdf_ref, bins_ref, u_ref, out_ref):
    # cdf/bins: [K, TILE]; u: [Q, TILE]; out: [Q, TILE]
    K = cdf_ref.shape[0]
    u = u_ref[:]
    neg = jnp.float32(-1e38)
    pos = jnp.float32(1e38)
    Q, T = u.shape

    # statically unrolled sweep: a fori_loop with dynamic sublane slices ran
    # ~12x slower than the VPU-bound estimate
    cdf_g0 = jnp.full((Q, T), neg)
    bins_g0 = jnp.full((Q, T), neg)
    cdf_g1 = jnp.full((Q, T), pos)
    bins_g1 = jnp.full((Q, T), pos)
    cdf_all = cdf_ref[:]
    bins_all = bins_ref[:]
    for k in range(K):
        c = cdf_all[k:k + 1, :]       # [1, TILE]
        b = bins_all[k:k + 1, :]
        le = c <= u                   # [Q, TILE] broadcast
        cdf_g0 = jnp.maximum(cdf_g0, jnp.where(le, c, neg))
        bins_g0 = jnp.maximum(bins_g0, jnp.where(le, b, neg))
        cdf_g1 = jnp.minimum(cdf_g1, jnp.where(le, pos, c))
        bins_g1 = jnp.minimum(bins_g1, jnp.where(le, pos, b))

    last_c = cdf_all[K - 1:K, :]
    last_b = bins_all[K - 1:K, :]
    cdf_g1 = jnp.minimum(cdf_g1, last_c)
    bins_g1 = jnp.minimum(bins_g1, last_b)

    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0),
                  0.0)
    t = jnp.clip(t, 0.0, 1.0)
    out_ref[:] = bins_g0 + t * (bins_g1 - bins_g0)


def sample_pdf_lookup_pallas(cdf, bins, u):
    """cdf, bins: [N, K] (rows sorted ascending); u: [N, Q] queries.
    Returns resampled bin edges [N, Q].  Forward-only (no vjp)."""
    N, K = cdf.shape
    Q = u.shape[1]
    pad = (-N) % TILE
    cdf_t = jnp.pad(cdf, ((0, pad), (0, 0))).T      # [K, N']
    bins_t = jnp.pad(bins, ((0, pad), (0, 0))).T
    u_t = jnp.pad(u, ((0, pad), (0, 0))).T          # [Q, N']
    grid = (cdf_t.shape[1] // TILE,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, cdf_t.shape[1]), jnp.float32),
    )(cdf_t, bins_t, u_t)
    return out.T[:N]
