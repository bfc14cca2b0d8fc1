"""Volume compositing and renderer loss terms, all in O(T) cumsum form.

Reference semantics:
  - alpha compositing with opaque-last-sample: nerf/renderer.py:308-325
  - efficient distortion loss (torch_efficient_distloss.eff_distloss used at
    nerf/renderer.py:17-27) — here as a pure-XLA closed form
  - interlevel proposal loss: nerf/renderer.py:30-57
"""
import jax
import jax.numpy as jnp


def compute_weights(deltas, sigmas, opaque_last: bool = True):
    """deltas, sigmas: [N, T] -> (weights [N, T], transmittance [N, T]).

    weights_i = alpha_i * T_i with T_i = exp(-sum_{j<i} delta_j sigma_j) and
    alpha_i = 1 - exp(-delta_i sigma_i).  When opaque_last, the last
    delta*sigma is replaced by +inf (background == 'last_sample').
    """
    ds = deltas * sigmas
    if opaque_last:
        ds = jnp.concatenate(
            [ds[..., :-1], jnp.full_like(ds[..., -1:], jnp.inf)], axis=-1
        )
    alphas = 1.0 - jnp.exp(-ds)
    accum = jnp.cumsum(ds[..., :-1], axis=-1)
    accum = jnp.concatenate([jnp.zeros_like(accum[..., :1]), accum], axis=-1)
    trans = jnp.exp(-accum)
    weights = jnp.nan_to_num(alphas * trans, nan=0.0)
    return weights, trans


def eff_distloss(weights, midpoints, intervals):
    """O(T) mip-360 distortion loss (mean over rays).

    loss = E_rays[ sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 itv_i ]
    computed with prefix sums assuming midpoints are sorted ascending per ray.
    """
    loss_uni = (1.0 / 3.0) * jnp.sum(intervals * weights ** 2, axis=-1)
    wm = weights * midpoints
    w_cum = jnp.cumsum(weights, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    loss_bi = 2.0 * jnp.sum(
        wm[..., 1:] * w_cum[..., :-1] - weights[..., 1:] * wm_cum[..., :-1],
        axis=-1,
    )
    return jnp.mean(loss_uni + loss_bi)


def distort_loss(bins, weights):
    """Reference: nerf/renderer.py:17-27. bins: [N, T+1], weights: [N, T]."""
    intervals = bins[..., 1:] - bins[..., :-1]
    midpoints = bins[..., :-1] + intervals / 2.0
    return eff_distloss(weights, midpoints, intervals)


def _searchsorted_right(sorted_rows, query_rows):
    # vectorized compare-and-count; see ops/ray.py for the TPU rationale
    return jnp.sum(
        (sorted_rows[:, None, :] <= query_rows[:, :, None]).astype(jnp.int32),
        axis=-1,
    )


def loss_interlevel(t0, w0, t1, w1):
    """Interlevel loss of one proposal level against the reference (final) level.

    Reference: nerf/renderer.py:35-49.  t0/w0: final nerf bins/weights
    (detached by caller), t1/w1: proposal bins/weights.  For each final-level
    interval, bound the proposal mass it overlaps and penalize shortfall.
    Returns per-element [N, T0] loss (caller means it).

    Implementation note: the reference gathers the proposal CDF at
    searchsorted indices; here the equivalent banded mask
    M[j,k] = inds_lo[j] <= k <= inds_hi[j] contracts the proposal weights
    directly (W = sum_k M*w1 == cw1[hi+1] - cw1[lo]).  One [N,T0,T1] mask
    instead of two searchsorted count tensors + two one-hot lookups — the
    backward is the same mask applied to the cotangent, so no CDF/scatter
    appears anywhere and the whole loss is ~3 elementwise passes.
    """
    T1 = w1.shape[-1]
    iota = jnp.arange(T1, dtype=jnp.int32)
    inds_lo = jnp.clip(
        _searchsorted_right(t1[..., :-1], t0[..., :-1]) - 1, 0, T1 - 1)
    inds_hi = jnp.clip(_searchsorted_right(t1[..., 1:], t0[..., 1:]), 0, T1 - 1)
    band = (inds_lo[..., None] <= iota) & (iota <= inds_hi[..., None])
    w = jnp.sum(jnp.where(band, w1[:, None, :], 0.0), axis=-1)
    return jnp.maximum(w0 - w, 0.0) ** 2 / (w0 + 1e-8)


def proposal_loss(all_bins, all_weights):
    """Reference: nerf/renderer.py:30-57.  Lists ordered coarse->fine; the
    final level is the (stop-gradient) reference distribution."""
    bins_ref = jax.lax.stop_gradient(all_bins[-1])
    weights_ref = jax.lax.stop_gradient(all_weights[-1])
    loss = 0.0
    for bins, weights in zip(all_bins[:-1], all_weights[:-1]):
        loss = loss + jnp.mean(loss_interlevel(bins_ref, weights_ref, bins, weights))
    return loss
