"""Fused frequency-encode + MLP forward as a Pallas TPU kernel.

WHY: the flagship MLP field is HBM-bound in XLA — every layer's
[N, hidden] activation round-trips HBM (~7-10 GB per 12M-point proposal
query).  This kernel tiles the point axis, computes freq-encode and all
dense layers inside VMEM, and writes only the final head — HBM traffic
drops to inputs+outputs (~50x less).  Weights (<= ~300 KB) are resident in
VMEM across the whole grid.

Gradients: custom_vjp whose backward differentiates the pure-jnp reference
implementation (recompute) — forward is Pallas-fast everywhere, training
backward is standard XLA.

Enable/disable with `PALLAS_ENABLED` (auto-on for TPU backends, off for
CPU where Mosaic is unavailable).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_enabled() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


PALLAS_ENABLED = _default_enabled()

TILE = 2048  # points per grid step


def _freq(x, degree: int, dtype):
    """Block-layout frequency encoding: [x, sin(2^0 x), cos(2^0 x), ...]
    concatenated in D-sized blocks — 2D-only ops (Mosaic cannot reshape a
    [T, D, F] intermediate).  Same span as ops/freq.py, permuted order;
    the first-layer weights absorb the permutation."""
    # widen first, then ONE sin and ONE cos pass — per-octave transcendental
    # passes on [T, 3]-wide tiles waste 97% of the VPU lanes
    f = jnp.concatenate([x * (2.0 ** k) for k in range(degree)], axis=-1)
    return jnp.concatenate([x, jnp.sin(f), jnp.cos(f)], axis=-1).astype(dtype)


def _reference_forward(x, ws, freq_degree: int, skip_layer: int,
                       compute_dtype=jnp.bfloat16):
    """Pure-jnp twin of the kernel (also the autodiff path)."""
    h = _freq(x.astype(jnp.float32), freq_degree, compute_dtype)
    h_in = h
    n = len(ws)
    for l, w in enumerate(ws):
        if l == skip_layer:
            h = jnp.concatenate([h, h_in], axis=-1)
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if l != n - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(compute_dtype) if l != n - 1 else h
    return h.astype(jnp.float32)


def _reference_forward_with_extra(x, extra, ws, freq_degree: int,
                                  skip_layer: int,
                                  compute_dtype=jnp.bfloat16):
    """_reference_forward with extra features appended to the freq
    encoding (layer-0 input layout [freq(x) | extra])."""
    h = jnp.concatenate(
        [_freq(x.astype(jnp.float32), freq_degree, compute_dtype),
         extra.astype(compute_dtype)], axis=-1)
    h_in = h
    n = len(ws)
    for l, w in enumerate(ws):
        if l == skip_layer:
            h = jnp.concatenate([h, h_in], axis=-1)
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if l != n - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(compute_dtype) if l != n - 1 else h
    return h.astype(jnp.float32)


def _freq_expansion_matrix(D: int, degree: int) -> np.ndarray:
    """[D, F] projection whose output columns are laid out like _freq:
    [x | 2^0 x .. 2^(deg-1) x (sin block) | same (cos block)]."""
    F = D * (1 + 2 * degree)
    P = np.zeros((D, F), np.float32)
    for d in range(D):
        P[d, d] = 1.0
        for k in range(degree):
            P[d, D + k * D + d] = 2.0 ** k
            P[d, D + degree * D + k * D + d] = 2.0 ** k
    return P


def _make_kernel(freq_degree: int, skip_layer: int, n_layers: int,
                 compute_dtype, D: int):
    # in-kernel freq encode via ONE matmul + masked sin/cos — lane-level
    # concatenation of [T, 3]-wide pieces is pathologically slow in Mosaic.
    # The expansion matrix P is a kernel INPUT (pallas forbids captured
    # consts); the sin/cos column masks are built from iota in-kernel.
    F = D * (1 + 2 * freq_degree)

    def kernel(p_ref, x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        x = x_ref[:].astype(jnp.float32)  # [TILE, D]
        a = jnp.dot(x, p_ref[:], preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        sin_end = D + freq_degree * D
        h = jnp.where((col >= D) & (col < sin_end), jnp.sin(a),
                      jnp.where(col >= sin_end, jnp.cos(a), a))
        h = h.astype(compute_dtype)
        h_in = h
        for l in range(n_layers):
            if l == skip_layer:
                h = jnp.concatenate([h, h_in], axis=-1)
            w = w_refs[l][:].astype(compute_dtype)
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            if l != n_layers - 1:
                h = jnp.maximum(h, 0.0).astype(compute_dtype)
        out_ref[:] = h.astype(jnp.float32)

    return kernel


def _pallas_forward(x, ws, freq_degree: int, skip_layer: int,
                    compute_dtype=jnp.bfloat16):
    B, D = x.shape
    out_dim = ws[-1].shape[1]
    n_layers = len(ws)
    pad = (-B) % TILE
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    grid = (xp.shape[0] // TILE,)

    kernel = _make_kernel(freq_degree, skip_layer, n_layers, compute_dtype, D)
    P = jnp.asarray(_freq_expansion_matrix(D, freq_degree))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(P.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in ws
        ],
        out_specs=pl.BlockSpec((TILE, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], out_dim), jnp.float32),
    )(P, xp, *ws)
    return out[:B]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(config, n_ws, x, *ws):
    freq_degree, skip_layer = config
    return _pallas_forward_t(x, ws, freq_degree, skip_layer)


def _fused_fwd(config, n_ws, x, *ws):
    return _fused(config, n_ws, x, *ws), (x, ws)


def _fused_bwd(config, n_ws, res, g):
    freq_degree, skip_layer = config
    x, ws = res
    _, vjp = jax.vjp(
        lambda x_, *ws_: _reference_forward(x_, ws_, freq_degree, skip_layer),
        x, *ws,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_freq_mlp(x, ws: Sequence[jnp.ndarray], freq_degree: int,
                   skip_layer: int = -1, use_pallas: bool = None):
    """x: [..., D]; ws: list of [in, out] kernels (no bias). Returns
    [..., out_dim] float32.  Falls back to the jnp reference off-TPU."""
    prefix = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    enabled = PALLAS_ENABLED if use_pallas is None else use_pallas
    if enabled:
        out = _fused((freq_degree, skip_layer), len(ws), x2, *ws)
    else:
        out = _reference_forward(x2, tuple(ws), freq_degree, skip_layer)
    return out.reshape(*prefix, out.shape[-1])


# ---------------------------------------------------------------------------
# v4: transposed layout — points on the LANE axis.
#
# The row-major kernel pads every [TILE, 3] input block to 128 lanes (42x
# VMEM waste), capping TILE at 2048 and leaving per-grid-step overhead
# dominant for narrow networks.  With features on sublanes and points on
# lanes ([D, TILE] blocks) nothing pads: TILE grows to 16K+, grid steps drop
# 8x, and narrow matmuls [out, in] @ [in, TILE] still hit the MXU.
# ---------------------------------------------------------------------------

TILE_T = 16384


def _make_kernel_t(freq_degree: int, skip_layer: int, n_layers: int,
                   compute_dtype, D: int):
    def kernel(p_ref, x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        x = x_ref[:].astype(jnp.float32)  # [D, TILE]
        a = jnp.dot(p_ref[:], x, preferred_element_type=jnp.float32)  # [F, T]
        row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        sin_end = D + freq_degree * D
        h = jnp.where((row >= D) & (row < sin_end), jnp.sin(a),
                      jnp.where(row >= sin_end, jnp.cos(a), a))
        h = h.astype(compute_dtype)
        h_in = h
        for l in range(n_layers):
            if l == skip_layer:
                h = jnp.concatenate([h, h_in], axis=0)
            w = w_refs[l][:].astype(compute_dtype)  # [out, in]
            h = jnp.dot(w, h, preferred_element_type=jnp.float32)
            if l != n_layers - 1:
                h = jnp.maximum(h, 0.0).astype(compute_dtype)
        out_ref[:] = h.astype(jnp.float32)

    return kernel


def _pallas_forward_t(x, ws, freq_degree: int, skip_layer: int,
                      compute_dtype=jnp.bfloat16):
    B, D = x.shape
    out_dim = ws[-1].shape[1]
    n_layers = len(ws)
    pad = (-B) % TILE_T
    xt = jnp.pad(x, ((0, pad), (0, 0))).T  # [D, B']
    grid = (xt.shape[1] // TILE_T,)

    kernel = _make_kernel_t(freq_degree, skip_layer, n_layers,
                            compute_dtype, D)
    P = jnp.asarray(_freq_expansion_matrix(D, freq_degree)).T  # [F, D]
    wts = [w.T for w in ws]  # [out, in]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(P.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE_T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=pl.BlockSpec((out_dim, TILE_T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, xt.shape[1]), jnp.float32),
    )(P, xt, *wts)
    return out[:, :B].T
