"""Ray-domain ops: AABB intersection, spacing functions, inverse-CDF sampling.

All fixed-shape and jit-friendly; these are the building blocks of the
proposal-sampling renderer (reference: nerf/renderer.py:84-139, 249-252).
"""
import jax
import jax.numpy as jnp


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.05):
    """Slab-test ray/AABB intersection.

    Reference: nerf/renderer.py:122-139.  aabb: [6] = (xmin,ymin,zmin,
    xmax,ymax,zmax). Returns near, far of shape [N, 1]; non-intersecting rays
    get near=far=1e9; near is clamped to min_near.
    """
    tmin = (aabb[:3] - rays_o) / (rays_d + 1e-15)
    tmax = (aabb[3:] - rays_o) / (rays_d + 1e-15)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    return near, far


def spacing_fn(x):
    """Mixed linear/lindisp warp: t < 1 -> t/2, else 1 - 1/(2t).

    Reference: nerf/renderer.py:249."""
    return jnp.where(x < 1.0, x / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(x, 1e-8)))


def spacing_fn_inv(s):
    """Inverse warp: s < 0.5 -> 2s, else 1/(2-2s). Reference: nerf/renderer.py:251."""
    return jnp.where(s < 0.5, 2.0 * s, 1.0 / jnp.maximum(2.0 - 2.0 * s, 1e-8))


def _searchsorted_right(sorted_rows, query_rows):
    """Row-wise searchsorted(side='right') for [N, K] sorted x [N, Q] queries.

    TPU-first: a vectorized compare-and-count (sum over K of a[k] <= q)
    instead of vmapped binary search — binary search lowers to serial
    dynamic-slices on TPU (catastrophic compile + run time), while the
    O(K*Q) compare fuses into a single VPU reduction."""
    return jnp.sum(
        (sorted_rows[:, None, :] <= query_rows[:, :, None]).astype(jnp.int32),
        axis=-1,
    )


def sample_pdf(bins, weights, T: int, key=None):
    """Inverse-CDF resampling of `T` new bin edges from a weight histogram.

    Reference: nerf/renderer.py:84-119.  bins: [N, T0+1] edges, weights:
    [N, T0].  Weights get +0.01 flooring; CDF is cumsum clamped to 1 with a
    leading zero; queries are the midpoints of T uniform strata (optionally
    jittered by +-0.5/T when `key` is given, matching perturb=True).
    Gradients are stopped by the caller (the reference `.detach()`s the
    result).
    """
    N, T0 = weights.shape
    weights = weights + 0.01
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.minimum(jnp.cumsum(pdf, axis=-1), 1.0)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, T0+1]

    u = jnp.linspace(0.5 / T, 1.0 - 0.5 / T, T, dtype=cdf.dtype)
    u = jnp.broadcast_to(u, (N, T))
    if key is not None:
        u = u + (jax.random.uniform(key, (N, T), dtype=u.dtype) - 0.5) / T

    # Pallas fast path on TPU (forward-only; the caller stop-gradients the
    # result, matching the reference's .detach() at nerf/renderer.py:273)
    from .fused_mlp import PALLAS_ENABLED

    if PALLAS_ENABLED:
        from .sample_pdf_pallas import sample_pdf_lookup_pallas

        return sample_pdf_lookup_pallas(
            jax.lax.stop_gradient(cdf), jax.lax.stop_gradient(bins), u
        )

    # TPU-first lookup: row-wise gathers (take_along_axis) lower to
    # scalar-issue XLA gathers and dominated the whole render.  Because both
    # cdf AND bins are monotone non-decreasing per row, the four lookups are
    # prefix/suffix masked reductions fused into ONE sweep over K:
    #   below = count(cdf <= u) - 1  ->  x[below] = max over {k: cdf_k <= u}
    #   above = min(count, T0)      ->  x[above] = min over {k: cdf_k >  u}
    #                                    (empty suffix -> last element)
    # (count >= 1 always since cdf[0] = 0 <= u, so the prefix is non-empty.)
    le = cdf[:, None, :] <= u[:, :, None]  # [N, T, T0+1]
    neg = jnp.float32(-1e38)
    pos = jnp.float32(1e38)
    cdf_g0 = jnp.max(jnp.where(le, cdf[:, None, :], neg), axis=-1)
    bins_g0 = jnp.max(jnp.where(le, bins[:, None, :], neg), axis=-1)
    cdf_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, cdf[:, None, :]), axis=-1), cdf[:, -1:]
    )
    bins_g1 = jnp.minimum(
        jnp.min(jnp.where(le, pos, bins[:, None, :]), axis=-1), bins[:, -1:]
    )

    denom = cdf_g1 - cdf_g0
    t = jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom > 0, denom, 1.0), 0.0)
    t = jnp.clip(jnp.nan_to_num(t), 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)
