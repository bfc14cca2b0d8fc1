"""Megakernels for the proposal/final render levels.

Fuses, per ray tile, the entire level pipeline in VMEM:
  sample positions -> contraction -> freq-MLP trunk -> density activation ->
  alpha compositing -> feature/depth accumulation
so none of the per-sample intermediates (xyz [N,T,3], features [N,T,16],
colors [N,T,31], sigmas/weights [N,T]) ever touch HBM.  Lanes hold RAYS;
the sample loop is statically unrolled, giving cheap sequential
transmittance accumulation in registers (a cumsum over samples is exactly
what the lane-parallel layout cannot vectorize, and exactly what a serial
register loop does for free).

SAMPLE GROUPING: per-sample unrolled loops are VPU-bound (each iteration
pays its own sin/cos pass and a small matmul — at T=128 proposal samples
that is ~95% of kernel time).  All kernels therefore batch G consecutive
samples along the LANE axis: geometry, sin/cos, and the MLP trunk run on
[rows, G*R] arrays, while only the [1, R] compositing recurrences stay
sequential.  sin/cos also run on the freq rows only (not a full-width
where-select), and the final level's SH color block is accumulated in
closed form (sum_s w_s*sh == weights_sum*sh).

TRAINING: both level kernels carry a custom VJP whose backward is itself
a grouped Pallas megakernel.  Key simplification exploited: NO gradient
flows into rays/bins/sh (bins come from stop_gradient'd sample_pdf or
linspace, rays are data) — only the MLP weight gradients [out, in] leave
the kernel, accumulated in VMEM across the ray grid.  Compositing
backward uses the closed form

  dL/d(ds_s) = G_s * T_{s+1} - sum_{j>s} G_j w_j,   G_s = dL/dw_s

with the suffix sum evaluated from pass-1 [1, R] scalars in reverse
order, so the expensive parts of the backward (activation recompute, dW
and d-activation matmuls) batch over whole groups.  relu masks come from
the next layer's stashed input (relu(x) > 0 <=> x > 0), halving the
activation stash.
"""
from __future__ import annotations

from functools import partial as _partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# rays per grid step (proposal/inference kernels); env-overridable for
# sweeps.  Hardware sweep (v5e, docs/PERF.md "R_TILE sweep"): 1024 2.77,
# 2048 2.87, 4096 2.94, 8192 2.89 Mrays/s — 4096 is the knee (VMEM reuse
# per grid step up, working set still well inside the 64 MiB limit).
R_TILE = int(_os.environ.get("SANERF_R_TILE", 4096))
# v5e has 128 MiB VMEM; the 16 MiB scoped default OOMs the training
# backward (weight-grad accumulators + activation stash + CP bases).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
# samples per matmul pass in the proposal kernel (G*R = 16384 lanes at
# the old 2048 tile; 4096x8 blows scoped vmem).  Env-overridable for sweeps.
GROUP_FWD_PROP = int(_os.environ.get("SANERF_GROUP_FWD_PROP", 8))
INTERPRET = False    # run kernels in interpret mode (CPU debug/tests)


def fused_final_level(rays_o, rays_d, real_bins, sh, ws: Sequence,
                      freq_degree: int, skip_layer: int, grid_bound: float,
                      opaque_last: bool = True, density_bias: float = 0.0,
                      cps: Sequence = (), cp_res: int = 0):
    """rays_o/rays_d: [N, 3]; real_bins: [N, T+1]; sh: [N, 16] per-ray
    direction encoding; ws: trunk kernels [in, out]; cps: optional three
    CP basis matrices [cp_res, rank] appended to the trunk input.
    Returns (f_image [N, 31], depth [N], weights_sum [N]).

    Thin delegate: the grouped train-forward kernel IS the inference
    kernel (identical fusion; the extra [N, T] weights output it emits is
    a negligible HBM write), so inference and training share one
    implementation and one compiled kernel."""
    cp_rank = cps[0].shape[1] if cps else 0
    f_img, depth, wsum, _ = final_level_train(
        (freq_degree, skip_layer, grid_bound, opaque_last, density_bias,
         cp_rank, cp_res),
        rays_o, rays_d, real_bins, sh, *ws, *cps)
    return f_img, depth, wsum


def fused_final_level_frozen(rays_o, rays_d, real_bins, sh, ws: Sequence,
                             freq_degree: int, skip_layer: int,
                             grid_bound: float, opaque_last: bool = True,
                             density_bias: float = 0.0, cps: Sequence = (),
                             cp_res: int = 0, need_geo: bool = False):
    """Frozen-backbone final level for the stage-2/3 side-output paths
    (return_feats / return_mask, reference nerf/renderer.py:304-305,
    359-385).  Same fusion as the train-forward kernel but with NO custom
    VJP — all inputs are stop-gradient'd, so under jax.grad the whole
    backbone render is DCE'd from the backward graph (the reference
    freezes the NeRF backbone during stages 2/3, main.py:249-256, so no
    gradient ever needs to flow here).

    Returns (f_image [N, C], depth [N], weights_sum [N], weights [N, T],
    geo [N, T, 15] or None) — geo is the per-sample trunk feature the
    mask MLP consumes (nerf/renderer.py:376-385), emitted straight from
    VMEM only when need_geo."""
    sg = jax.lax.stop_gradient
    rays_o, rays_d, real_bins, sh = (sg(rays_o), sg(rays_d), sg(real_bins),
                                     sg(sh))
    ws = [sg(w) for w in ws]
    cps = [sg(c) for c in cps]
    cp_rank = cps[0].shape[1] if cps else 0
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    G = _pick_group(T, GROUP_FWD)
    r_tile = R_TILE_TRAIN // 2 if cp_rank else R_TILE_TRAIN
    pad = (-N) % r_tile
    ot, dt = _pad_t(rays_o, pad), _pad_t(rays_d, pad)
    bt = _pad_t(real_bins, pad, cv=1.0)
    st = _pad_t(sh, pad)
    Np = ot.shape[1]
    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    cbt = [c.T for c in cps]
    C = 15 + sh.shape[1]

    kernel = _make_final_train_kernel(T, G, n_layers, skip_layer,
                                      freq_degree, grid_bound, opaque_last,
                                      density_bias, jnp.bfloat16,
                                      cp_rank=cp_rank, cp_res=cp_res,
                                      geo_out=need_geo)
    out_specs = [
        _row_spec(C, r_tile),
        _row_spec(1, r_tile),
        _row_spec(1, r_tile),
        _row_spec(T, r_tile),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, Np), jnp.float32),
        jax.ShapeDtypeStruct((1, Np), jnp.float32),
        jax.ShapeDtypeStruct((1, Np), jnp.float32),
        jax.ShapeDtypeStruct((T, Np), jnp.float32),
    ]
    if need_geo:
        out_specs.append(_row_spec(15 * T, r_tile))
        out_shape.append(jax.ShapeDtypeStruct((15 * T, Np), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=(Np // r_tile,),
        in_specs=[_const_spec(Pf.shape)]
        + [_row_spec(r, r_tile) for r in (3, 3, T + 1, sh.shape[1])]
        + [_const_spec(w.shape) for w in wts]
        + [_const_spec(c.shape) for c in cbt],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
    )(Pf, ot, dt, bt, st, *wts, *cbt)
    f_img, depth, wsum, w_out = outs[:4]
    geo = None
    if need_geo:
        # rows are sample-major (s*15 + c) -> row-major reshape to [N,T,15]
        geo = outs[4].T[:N].reshape(N, T, 15)
    return f_img.T[:N], depth[0, :N], wsum[0, :N], w_out.T[:N], geo


# ---------------------------------------------------------------------------
# Proposal-level megakernel: same fusion (geometry + prop MLP + alpha
# compositing) but emits the per-sample WEIGHTS [N, T] that sample_pdf
# consumes, instead of composited features.
# ---------------------------------------------------------------------------

def _make_prop_kernel(T: int, G: int, n_layers: int, freq_degree: int,
                      grid_bound: float, opaque_last: bool, db: float,
                      compute_dtype):
    def kernel(pf_ref, o_ref, d_ref, bins_ref, *refs):
        w_refs = refs[:n_layers]
        wout_ref = refs[n_layers]

        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        pf_val = pf_ref[:]
        w_vals = [w[:] for w in w_refs]
        R = o.shape[1]

        trans = jnp.ones((1, R), jnp.float32)
        for gi in range(T // G):
            _, d_sl, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                      grid_bound)
            h = _trunk_fwd(hf, w_vals, -1, compute_dtype)
            sigma = jnp.exp(jnp.clip(h[0:1, :] + db, -30.0, 15.0))
            for g in range(G):
                s = gi * G + g
                sl = slice(g * R, (g + 1) * R)
                if opaque_last and s == T - 1:
                    e = jnp.zeros((1, R), jnp.float32)
                else:
                    e = jnp.exp(-d_sl[g] * sigma[:, sl])
                wout_ref[s:s + 1, :] = (1.0 - e) * trans
                trans = trans * e

    return kernel


def fused_prop_level(rays_o, rays_d, real_bins, ws: Sequence,
                     freq_degree: int, grid_bound: float,
                     opaque_last: bool = True, density_bias: float = 0.0):
    """Returns per-sample compositing weights [N, T] of a proposal level."""
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    G = _pick_group(T, GROUP_FWD_PROP)
    pad = (-N) % R_TILE
    ot = jnp.pad(rays_o, ((0, pad), (0, 0))).T
    dt = jnp.pad(rays_d, ((0, pad), (0, 0))).T
    bt = jnp.pad(real_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    Np = ot.shape[1]
    grid = (Np // R_TILE,)

    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    kernel = _make_prop_kernel(T, G, n_layers, freq_degree, grid_bound,
                               opaque_last, density_bias, jnp.bfloat16)
    wout = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=grid,
        in_specs=[
            pl.BlockSpec(Pf.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=pl.BlockSpec((T, R_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Np), jnp.float32),
    )(Pf, ot, dt, bt, *wts)
    return wout.T[:N]


# ---------------------------------------------------------------------------
# Proposal megakernel WITH in-VMEM inverse-CDF resampling (inference).
#
# The composable inference path round-trips per-sample weights [N, T]
# through HBM (prop kernel out -> transpose -> +0.01 / normalize / cumsum
# in XLA -> transpose -> sample_pdf lookup kernel) just to produce the
# next level's T'+1 bin edges.  Folding the resampling into the prop
# kernel's epilogue removes all of it: the weights stay in VMEM scratch,
# the cdf is an in-register running sum, and the prefix/suffix lookups are
# the same statically-unrolled [Q, R] sweep sample_pdf_lookup_pallas runs
# — against the UNNORMALIZED cumsum, comparing with u*total instead of
# dividing (the selection and the final interpolation ratio are invariant
# under the positive scaling).  Training keeps the weights output: the
# interlevel proposal loss consumes them (ops/composite.py).
# ---------------------------------------------------------------------------

def _make_prop_sample_kernel(T: int, Q: int, G: int, n_layers: int,
                             freq_degree: int, grid_bound: float,
                             opaque_last: bool, db: float, compute_dtype,
                             weights_out: bool = False):
    """weights_out=False (inference): weights live only in VMEM scratch.
    weights_out=True (training): the RAW weights are also a kernel output
    (the interlevel proposal loss consumes them) and double as the pass-2
    staging buffer."""
    def kernel(pf_ref, o_ref, d_ref, bins_ref, sbins_ref, u_ref, *refs):
        w_refs = refs[:n_layers]
        if weights_out:
            wsc_ref = refs[n_layers]      # output [T, R]: raw weights
            out_ref = refs[n_layers + 1]  # output [Q, R]: next bins
        else:
            out_ref = refs[n_layers]      # output [Q, R]
            wsc_ref = refs[n_layers + 1]  # VMEM scratch [T, R]: w + 0.01
        floor = 0.0 if weights_out else 0.01

        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        pf_val = pf_ref[:]
        w_vals = [w[:] for w in w_refs]
        R = o.shape[1]

        # pass 1: the prop level itself (identical to _make_prop_kernel),
        # weights to the staging buffer + running floored total
        trans = jnp.ones((1, R), jnp.float32)
        total = jnp.zeros((1, R), jnp.float32)
        for gi in range(T // G):
            _, d_sl, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                      grid_bound)
            h = _trunk_fwd(hf, w_vals, -1, compute_dtype)
            sigma = jnp.exp(jnp.clip(h[0:1, :] + db, -30.0, 15.0))
            for g in range(G):
                s = gi * G + g
                sl = slice(g * R, (g + 1) * R)
                if opaque_last and s == T - 1:
                    e = jnp.zeros((1, R), jnp.float32)
                else:
                    e = jnp.exp(-d_sl[g] * sigma[:, sl])
                w = (1.0 - e) * trans + floor
                wsc_ref[s:s + 1, :] = w
                total = total + w + (0.01 - floor)
                trans = trans * e

        # pass 2: inverse-CDF lookup on the raw cumsum (ops/ray.py
        # sample_pdf semantics; cdf_k <= u  <=>  cumsum_k <= u*total)
        u = u_ref[:]                        # [Q, R]
        ut = u * total                      # broadcast [1,R] over Q rows
        neg = jnp.float32(-1e38)
        pos = jnp.float32(1e38)
        c_g0 = jnp.full((Q, R), neg)
        s_g0 = jnp.full((Q, R), neg)
        c_g1 = jnp.full((Q, R), pos)
        s_g1 = jnp.full((Q, R), pos)
        c = jnp.zeros((1, R), jnp.float32)  # cdf edge 0
        for ei in range(T + 1):
            sb = sbins_ref[ei:ei + 1, :]
            le = c <= ut                    # [Q, R]
            c_g0 = jnp.maximum(c_g0, jnp.where(le, c, neg))
            s_g0 = jnp.maximum(s_g0, jnp.where(le, sb, neg))
            c_g1 = jnp.minimum(c_g1, jnp.where(le, pos, c))
            s_g1 = jnp.minimum(s_g1, jnp.where(le, pos, sb))
            if ei < T:
                c = jnp.minimum(
                    c + wsc_ref[ei:ei + 1, :] + (0.01 - floor), total)
        c_g1 = jnp.minimum(c_g1, c)         # empty suffix -> last entry
        s_g1 = jnp.minimum(s_g1, sbins_ref[T:T + 1, :])

        denom = c_g1 - c_g0
        t = jnp.where(denom > 0,
                      (ut - c_g0) / jnp.where(denom > 0, denom, 1.0), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        out_ref[:] = s_g0 + t * (s_g1 - s_g0)

    return kernel


def fused_prop_level_sample(rays_o, rays_d, real_bins, s_bins, u,
                            ws: Sequence, freq_degree: int,
                            grid_bound: float, opaque_last: bool = True,
                            density_bias: float = 0.0):
    """Proposal level + inverse-CDF resampling in one kernel.

    s_bins: [N, T+1] s-space edges of THIS level; u: [N, Q] stratified
    queries for the next level.  Returns the next level's s-space bin
    edges [N, Q]; per-sample weights never leave VMEM."""
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    Q = u.shape[1]
    n_layers = len(ws)
    G = _pick_group(T, GROUP_FWD_PROP)
    pad = (-N) % R_TILE
    ot = jnp.pad(rays_o, ((0, pad), (0, 0))).T
    dt = jnp.pad(rays_d, ((0, pad), (0, 0))).T
    bt = jnp.pad(real_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    st = jnp.pad(s_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    utq = jnp.pad(u, ((0, pad), (0, 0)), constant_values=0.5).T
    Np = ot.shape[1]
    grid = (Np // R_TILE,)

    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    kernel = _make_prop_sample_kernel(T, Q, G, n_layers, freq_degree,
                                      grid_bound, opaque_last, density_bias,
                                      jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=grid,
        in_specs=[
            pl.BlockSpec(Pf.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=pl.BlockSpec((Q, R_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, R_TILE), jnp.float32)],
    )(Pf, ot, dt, bt, st, utq, *wts)
    return out.T[:N]


def _prop_level_sample_train_impl(rays_o, rays_d, real_bins, s_bins, u,
                                  ws, freq_degree, grid_bound,
                                  opaque_last, density_bias):
    """Training twin of fused_prop_level_sample: emits (weights [N, T],
    next s-bins [N, Q]) — the weights feed the interlevel proposal loss,
    so they stay a kernel output here."""
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    Q = u.shape[1]
    n_layers = len(ws)
    G = _pick_group(T, GROUP_FWD_PROP)
    pad = (-N) % R_TILE
    ot = jnp.pad(rays_o, ((0, pad), (0, 0))).T
    dt = jnp.pad(rays_d, ((0, pad), (0, 0))).T
    bt = jnp.pad(real_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    st = jnp.pad(s_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    utq = jnp.pad(u, ((0, pad), (0, 0)), constant_values=0.5).T
    Np = ot.shape[1]

    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    kernel = _make_prop_sample_kernel(T, Q, G, n_layers, freq_degree,
                                      grid_bound, opaque_last, density_bias,
                                      jnp.bfloat16, weights_out=True)
    wout, nxt = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=(Np // R_TILE,),
        in_specs=[
            pl.BlockSpec(Pf.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=(
            pl.BlockSpec((T, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Np), jnp.float32),
            jax.ShapeDtypeStruct((Q, Np), jnp.float32),
        ),
    )(Pf, ot, dt, bt, st, utq, *wts)
    return wout.T[:N], nxt.T[:N]


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def prop_level_train_sample(static, rays_o, rays_d, real_bins, s_bins, u,
                            *ws):
    """Differentiable fused proposal level WITH in-kernel inverse-CDF
    resampling.  static = (freq_degree, grid_bound, opaque_last,
    density_bias).  Returns (weights [N, T], next s-bins [N, Q]); grads
    flow to ws through the weights only — the resampled bins are
    stop-gradient by construction (the reference detaches sample_pdf,
    nerf/renderer.py:273)."""
    freq_degree, grid_bound, opaque_last, db = static
    return _prop_level_sample_train_impl(
        rays_o, rays_d, real_bins, s_bins, u, list(ws), freq_degree,
        grid_bound, opaque_last, db)


def _prop_train_sample_fwd(static, rays_o, rays_d, real_bins, s_bins, u,
                           *ws):
    freq_degree, grid_bound, opaque_last, db = static
    out = _prop_level_sample_train_impl(
        rays_o, rays_d, real_bins, s_bins, u, list(ws), freq_degree,
        grid_bound, opaque_last, db)
    return out, (rays_o, rays_d, real_bins, s_bins, u, ws)


def _prop_train_sample_bwd(static, res, g):
    g_w, _ = g  # cotangent for the resampled bins is discarded (detached)
    rays_o, rays_d, real_bins, s_bins, u, ws = res
    zeros = _prop_train_bwd(static, (rays_o, rays_d, real_bins, ws), g_w)
    # insert zero grads for s_bins and u between real_bins and ws
    return (zeros[0], zeros[1], zeros[2], jnp.zeros_like(s_bins),
            jnp.zeros_like(u)) + zeros[3:]


# ---------------------------------------------------------------------------
# Training path: custom-VJP megakernels (sample-GROUPED, round-2 v2).
#
# The v1 per-sample loops were VPU-bound: T statically-unrolled iterations
# each doing its own [F, R] sin/cos pass and small matmuls (the proposal
# trunk is only ~7k MACs/sample, so at T=128 the backward spent ~95% of its
# time in per-sample transcendentals and op overhead, 1.6 ms vs a ~0.1 ms
# matmul floor).  v2 batches G consecutive samples along the LANE axis:
# geometry, sin/cos, the MLP trunk, and all backward matmuls run on
# [rows, G*R] arrays (one pass per group), while only the inherently
# sequential compositing recurrences (transmittance forward, suffix sum
# backward) stay per-sample — and those are [1, R] VPU ops, essentially
# free.  sin/cos also moved from full-width where-selects to row slices
# (2.1x fewer transcendentals), and the final level's SH color block is
# accumulated in closed form (sum_s w_s * sh == weights_sum * sh) instead
# of a 16-row FMA per sample.
# ---------------------------------------------------------------------------

def _env_int(name, default):
    return int(_os.environ.get(name, default))


R_TILE_TRAIN = _env_int("SANERF_R_TILE_TRAIN", 2048)  # forward tile (rays)
R_TILE_BWD = _env_int("SANERF_R_TILE_BWD", 1024)  # proposal backward tile
R_TILE_BWD_FINAL = _env_int("SANERF_R_TILE_BWD_FINAL", 512)
                          # final backward stashes 894 activation rows ->
                          # G*R = 2048 lanes is the scoped-vmem ceiling
GROUP_FWD = _env_int("SANERF_GROUP_FWD", 8)
                     # samples batched per matmul pass (forward kernels);
                     # v5e sweep: 2 2.84, 4 2.94, 8 2.95, 16 2.84 Mrays/s
GROUP_BWD_FINAL = _env_int("SANERF_GROUP_BWD_FINAL", 4)
GROUP_BWD_PROP = _env_int("SANERF_GROUP_BWD_PROP", 8)


def _pick_group(T: int, want: int) -> int:
    g = want
    while T % g:
        g //= 2
    return max(g, 1)


def _freq_rows_matrix(D: int, degree: int) -> np.ndarray:
    """[degree*D, D] rows of the freq expansion (sin block only; the cos
    block repeats it).  hf row layout stays [x | sin | cos] to match the
    fused_mlp weight convention."""
    Pf = np.zeros((degree * D, D), np.float32)
    for d in range(D):
        for k in range(degree):
            Pf[k * D + d, d] = 2.0 ** k
    return Pf


def _geom_group(o, dd, bins_ref, s0, G, pf_val, grid_bound):
    """Geometry for samples s0..s0+G-1 batched along lanes.

    Returns (t_sl: G x [1,R] midpoints, d_sl: G x [1,R] interval widths,
    hf [D+2F, G*R] fp32 freq features).  o/dd are [3, R] in-kernel values;
    bins_ref is the [T+1, R] ref."""
    t_sl, d_sl, xyz_sl = [], [], []
    for g in range(G):
        b0 = bins_ref[s0 + g:s0 + g + 1, :]
        b1 = bins_ref[s0 + g + 1:s0 + g + 2, :]
        t = (b0 + b1) * 0.5
        t_sl.append(t)
        d_sl.append(b1 - b0)
        xyz_sl.append(o + dd * t)
    xyz = xyz_sl[0] if G == 1 else jnp.concatenate(xyz_sl, axis=1)  # [3,G*R]
    ax = jnp.abs(xyz)
    mag = jnp.max(ax, axis=0, keepdims=True)
    is_max = ax == mag
    inv = 1.0 / jnp.maximum(mag, 1e-38)
    scale = jnp.where(is_max, (2.0 - inv) * inv, inv)
    xyz = jnp.where(mag < 1.0, xyz, xyz * scale) / grid_bound
    af = jnp.dot(pf_val, xyz, preferred_element_type=jnp.float32)  # [F,G*R]
    hf = jnp.concatenate([xyz, jnp.sin(af), jnp.cos(af)], axis=0)
    return t_sl, d_sl, hf


CP_CHUNK = 64  # basis rows per one-hot matmul pass (bounds VMEM transients)


def _cp_extra(xn, cb_vals, cp_res: int, keep_las: bool = False):
    """CP line features inside the kernel (TensoRF-style, the same
    contraction models/mlp_field.py:cp_features does in XLA).

    xn: [3, L] contracted/normalized coords in [-1, 1]; cb_vals: three
    TRANSPOSED basis matrices [rank, S].  The linear-interp gather is an
    iota-compare one-hot [S_chunk, L] contracted against the basis on the
    MXU — no gathers, fp32 throughout (parity with the XLA oracle).
    Returns extra [rank, L] (and the per-axis factors when keep_las, for
    the backward product rule)."""
    S = cp_res
    cs = min(CP_CHUNK, S)
    L = xn.shape[1]
    p = jnp.clip((xn + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
    i0 = jnp.clip(jnp.floor(p), 0.0, S - 2.0)  # float compare vs iota
    f = p - i0
    g = None
    las = []
    for a in range(3):
        ia = i0[a:a + 1, :].astype(jnp.int32)
        fa = f[a:a + 1, :]
        la = None
        for c0 in range(0, S, cs):
            # Mosaic requires integer iota results; compare in int space.
            iota = jax.lax.broadcasted_iota(jnp.int32, (cs, L), 0) + c0
            W = (jnp.where(iota == ia, 1.0 - fa, 0.0)
                 + jnp.where(iota == ia + 1, fa, 0.0))
            part = jnp.dot(cb_vals[a][:, c0:c0 + cs], W,
                           preferred_element_type=jnp.float32)
            la = part if la is None else la + part
        if keep_las:
            las.append(la)
        g = la if g is None else g * la
    return (g, las) if keep_las else g


def _cp_bwd_accum(xn, d_las, dcb_refs, cp_res: int):
    """Accumulate basis grads: dB_a^T += d_La_a @ W_a^T, chunked over the
    S axis like the forward."""
    S = cp_res
    cs = min(CP_CHUNK, S)
    L = xn.shape[1]
    p = jnp.clip((xn + 1.0) * 0.5, 0.0, 1.0) * (S - 1)
    i0 = jnp.clip(jnp.floor(p), 0.0, S - 2.0)
    f = p - i0
    for a in range(3):
        ia = i0[a:a + 1, :].astype(jnp.int32)
        fa = f[a:a + 1, :]
        for c0 in range(0, S, cs):
            iota = jax.lax.broadcasted_iota(jnp.int32, (cs, L), 0) + c0
            W = (jnp.where(iota == ia, 1.0 - fa, 0.0)
                 + jnp.where(iota == ia + 1, fa, 0.0))
            dcb_refs[a][:, c0:c0 + cs] += jax.lax.dot_general(
                d_las[a], W, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _trunk_fwd(h_freq, w_vals, skip_layer, compute_dtype,
               keep_inputs: bool = False):
    """Forward through the bias-free trunk. w_vals: [out, in] values.
    Returns h_out fp32 (and the per-layer INPUT activations when
    keep_inputs — relu masks are recoverable from the next layer's input,
    so outputs need not be stashed)."""
    h = h_freq.astype(compute_dtype)
    h_in = h
    inputs = []
    n = len(w_vals)
    for l, w in enumerate(w_vals):
        if l == skip_layer:
            h = jnp.concatenate([h, h_in], axis=0)
        if keep_inputs:
            inputs.append(h)
        h = jnp.dot(w.astype(compute_dtype), h,
                    preferred_element_type=jnp.float32)
        if l != n - 1:
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    if keep_inputs:
        return h, inputs
    return h


def _trunk_bwd_accum(dh, w_vals, inputs, skip_layer, compute_dtype,
                     dw_refs, extra_rows: int = 0):
    """Accumulate weight grads into dw_refs.  dh: [out_last, G*R] fp32 grad
    wrt the LAST layer's pre-activation output.  relu masks come from the
    next layer's stashed input (relu(x) > 0 <=> x > 0).

    With extra_rows > 0, the trailing rows of the layer-0 input are CP
    features; returns their gradient [extra_rows, G*R] (accumulated over
    both the layer-0 entry and the skip-concat re-entry) — the only input
    gradient that leaves the trunk (rays/bins/sh still get none)."""
    n = len(w_vals)
    d = dh.astype(compute_dtype)
    d_extra = None
    for l in range(n - 1, -1, -1):
        # dW_l += d @ inputs[l]^T  (contract the lane/ray axis)
        dw_refs[l][:] += jax.lax.dot_general(
            d, inputs[l],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l == 0:
            if extra_rows:
                de = jax.lax.dot_general(
                    w_vals[0][:, -extra_rows:].astype(compute_dtype), d,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d_extra = de if d_extra is None else d_extra + de
            break
        da = jax.lax.dot_general(
            w_vals[l].astype(compute_dtype), d,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [in_l, G*R]
        if l == skip_layer:
            # layer l's input was concat(act, h_in); only the act half
            # propagates (no grads to rays/bins) — except the CP rows of
            # the re-entrant h_in, whose gradient we keep
            rows = inputs[l].shape[0] - inputs[0].shape[0]
            if extra_rows:
                de = da[rows + inputs[0].shape[0] - extra_rows:]
                d_extra = de if d_extra is None else d_extra + de
            da = da[:rows]
            act = inputs[l][:rows]
        else:
            act = inputs[l]
        # relu mask in fp32 (Mosaic cannot compare bf16 vectors)
        d = jnp.where(act.astype(jnp.float32) > 0.0, da, 0.0).astype(
            compute_dtype)
    return d_extra


def _make_final_train_kernel(T, G, n_layers, skip_layer, freq_degree,
                             grid_bound, opaque_last, db, compute_dtype,
                             cp_rank=0, cp_res=0, geo_out=False):
    n_cp = 3 if cp_rank else 0

    def kernel(pf_ref, o_ref, d_ref, bins_ref, sh_ref, *refs):
        w_refs = refs[:n_layers]
        cb_refs = refs[n_layers:n_layers + n_cp]
        if geo_out:
            # geo_ref rows are [sample-major | channel-minor]: row s*15+c
            # holds channel c of sample s, so the host-side reshape
            # [N, 15*T] -> [N, T, 15] is a free row-major view
            (fimg_ref, depth_ref, wsum_ref, w_out_ref,
             geo_ref) = refs[n_layers + n_cp:]
        else:
            fimg_ref, depth_ref, wsum_ref, w_out_ref = refs[n_layers + n_cp:]
        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        sh = sh_ref[:].astype(jnp.float32)
        R = o.shape[1]
        pf_val = pf_ref[:]
        w_vals = [w[:] for w in w_refs]
        cb_vals = [c[:] for c in cb_refs]

        f_feat = jnp.zeros((15, R), jnp.float32)
        depth = jnp.zeros((1, R), jnp.float32)
        wsum = jnp.zeros((1, R), jnp.float32)
        trans = jnp.ones((1, R), jnp.float32)
        for gi in range(T // G):
            t_sl, d_sl, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                         grid_bound)
            if n_cp:
                extra = _cp_extra(hf[:3], cb_vals, cp_res)
                hf = jnp.concatenate([hf, extra], axis=0)
            h = _trunk_fwd(hf, w_vals, skip_layer, compute_dtype)
            sigma = jnp.exp(jnp.clip(h[0:1, :] + db, -30.0, 15.0))  # [1, G*R]
            for g in range(G):
                s = gi * G + g
                sl = slice(g * R, (g + 1) * R)
                if opaque_last and s == T - 1:
                    e = jnp.zeros((1, R), jnp.float32)
                else:
                    e = jnp.exp(-d_sl[g] * sigma[:, sl])
                w_s = (1.0 - e) * trans
                trans = trans * e
                f_feat = f_feat + w_s * h[1:, sl]
                depth = depth + w_s * t_sl[g]
                wsum = wsum + w_s
                w_out_ref[s:s + 1, :] = w_s
                if geo_out:
                    geo_ref[s * 15:(s + 1) * 15, :] = h[1:, sl]
        fimg_ref[0:15, :] = f_feat
        fimg_ref[15:, :] = wsum * sh  # sum_s w_s*sh in closed form
        depth_ref[:] = depth
        wsum_ref[:] = wsum

    return kernel


def _make_final_bwd_kernel(T, G, n_layers, skip_layer, freq_degree,
                           grid_bound, opaque_last, db, compute_dtype,
                           cp_rank=0, cp_res=0):
    n_cp = 3 if cp_rank else 0

    def kernel(pf_ref, o_ref, d_ref, bins_ref, sh_ref, *refs):
        w_refs = refs[:n_layers]
        cb_refs = refs[n_layers:n_layers + n_cp]
        gf_ref, gd_ref, gws_ref, gw_ref = \
            refs[n_layers + n_cp:n_layers + n_cp + 4]
        dw_refs = refs[n_layers + n_cp + 4:n_layers + n_cp + 4 + n_layers]
        dcb_refs = refs[n_layers + n_cp + 4 + n_layers:]

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            for r in list(dw_refs) + list(dcb_refs):
                r[:] = jnp.zeros_like(r)

        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        sh = sh_ref[:].astype(jnp.float32)
        gf = gf_ref[:]          # [C, R] upstream grad of f_image
        gd = gd_ref[:]          # [1, R]
        gws = gws_ref[:]        # [1, R]
        pf_val = pf_ref[:]
        w_vals = [w[:] for w in w_refs]
        cb_vals = [c[:] for c in cb_refs]
        R = o.shape[1]

        # dL/dw_s contribution from the sh half of color is sample-const
        g_sh = jnp.sum(gf[15:] * sh, axis=0, keepdims=True)  # [1, R]
        gf_feat = gf[:15]
        gf_tile = (gf_feat if G == 1 else
                   jnp.concatenate([gf_feat] * G, axis=1))  # [15, G*R]

        # pass 1: grouped forward; stash per-sample [1,R] scalars only
        trans = jnp.ones((1, R), jnp.float32)
        G_l, w_l, Tn_l, raw_l, dl_l = [], [], [], [], []
        for gi in range(T // G):
            t_sl, d_sl, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                         grid_bound)
            if n_cp:
                hf = jnp.concatenate(
                    [hf, _cp_extra(hf[:3], cb_vals, cp_res)], axis=0)
            h = _trunk_fwd(hf, w_vals, skip_layer, compute_dtype)
            raw = h[0:1, :]
            sigma = jnp.exp(jnp.clip(raw + db, -30.0, 15.0))
            dotcol = jnp.sum(gf_tile * h[1:, :], axis=0,
                             keepdims=True)  # [1, G*R]
            for g in range(G):
                s = gi * G + g
                sl = slice(g * R, (g + 1) * R)
                if opaque_last and s == T - 1:
                    e = jnp.zeros((1, R), jnp.float32)
                else:
                    e = jnp.exp(-d_sl[g] * sigma[:, sl])
                w_s = (1.0 - e) * trans
                Tn = trans * e
                trans = Tn
                G_l.append(dotcol[:, sl] + g_sh + gd * t_sl[g] + gws
                           + gw_ref[s:s + 1, :])
                w_l.append(w_s)
                Tn_l.append(Tn)
                raw_l.append(raw[:, sl])
                dl_l.append(d_sl[g])

        # pass 2 (reverse group order): suffix sum + grouped trunk backprop
        S = jnp.zeros((1, R), jnp.float32)
        for gi in range(T // G - 1, -1, -1):
            d_raw_sl = [None] * G
            for g in range(G - 1, -1, -1):
                s = gi * G + g
                d_ds = G_l[s] * Tn_l[s] - S
                S = S + G_l[s] * w_l[s]
                if opaque_last and s == T - 1:
                    d_raw_sl[g] = jnp.zeros((1, R), jnp.float32)
                else:
                    sigma = jnp.exp(jnp.clip(raw_l[s] + db, -30.0, 15.0))
                    in_range = (raw_l[s] + db > -30.0) & (raw_l[s] + db < 15.0)
                    d_raw_sl[g] = jnp.where(in_range,
                                            d_ds * dl_l[s] * sigma, 0.0)
            _, _, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                   grid_bound)
            if n_cp:
                xn = hf[:3]
                extra, las = _cp_extra(xn, cb_vals, cp_res, keep_las=True)
                hf = jnp.concatenate([hf, extra], axis=0)
            _, inputs = _trunk_fwd(hf, w_vals, skip_layer, compute_dtype,
                                   keep_inputs=True)
            d_raw = (d_raw_sl[0] if G == 1 else
                     jnp.concatenate(d_raw_sl, axis=1))
            w_row = (w_l[gi * G] if G == 1 else
                     jnp.concatenate(w_l[gi * G:gi * G + G], axis=1))
            dh = jnp.concatenate([d_raw, w_row * gf_tile], axis=0)  # [16,·]
            d_extra = _trunk_bwd_accum(dh, w_vals, inputs, skip_layer,
                                       compute_dtype, dw_refs,
                                       extra_rows=cp_rank)
            if n_cp:
                # product rule through extra = La_x * La_y * La_z
                d_las = [d_extra * las[1] * las[2],
                         d_extra * las[0] * las[2],
                         d_extra * las[0] * las[1]]
                _cp_bwd_accum(xn, d_las, dcb_refs, cp_res)

    return kernel


def _make_prop_bwd_kernel(T, G, n_layers, freq_degree, grid_bound,
                          opaque_last, db, compute_dtype):
    def kernel(pf_ref, o_ref, d_ref, bins_ref, *refs):
        w_refs = refs[:n_layers]
        gw_ref = refs[n_layers]
        dw_refs = refs[n_layers + 1:]

        @pl.when(pl.program_id(0) == 0)
        def _zero():
            for r in dw_refs:
                r[:] = jnp.zeros_like(r)

        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        pf_val = pf_ref[:]
        w_vals = [w[:] for w in w_refs]
        R = o.shape[1]

        trans = jnp.ones((1, R), jnp.float32)
        w_l, Tn_l, raw_l, dl_l = [], [], [], []
        for gi in range(T // G):
            _, d_sl, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                      grid_bound)
            h = _trunk_fwd(hf, w_vals, -1, compute_dtype)
            raw = h[0:1, :]
            sigma = jnp.exp(jnp.clip(raw + db, -30.0, 15.0))
            for g in range(G):
                s = gi * G + g
                sl = slice(g * R, (g + 1) * R)
                if opaque_last and s == T - 1:
                    e = jnp.zeros((1, R), jnp.float32)
                else:
                    e = jnp.exp(-d_sl[g] * sigma[:, sl])
                w_l.append((1.0 - e) * trans)
                Tn_l.append(trans * e)
                trans = trans * e
                raw_l.append(raw[:, sl])
                dl_l.append(d_sl[g])

        S = jnp.zeros((1, R), jnp.float32)
        for gi in range(T // G - 1, -1, -1):
            d_raw_sl = [None] * G
            for g in range(G - 1, -1, -1):
                s = gi * G + g
                G_s = gw_ref[s:s + 1, :]
                d_ds = G_s * Tn_l[s] - S
                S = S + G_s * w_l[s]
                if opaque_last and s == T - 1:
                    # forced-opaque sample: density gets no grad
                    d_raw_sl[g] = jnp.zeros((1, R), jnp.float32)
                else:
                    sigma = jnp.exp(jnp.clip(raw_l[s] + db, -30.0, 15.0))
                    in_range = (raw_l[s] + db > -30.0) & (raw_l[s] + db < 15.0)
                    d_raw_sl[g] = jnp.where(in_range,
                                            d_ds * dl_l[s] * sigma, 0.0)
            _, _, hf = _geom_group(o, dd, bins_ref, gi * G, G, pf_val,
                                   grid_bound)
            _, inputs = _trunk_fwd(hf, w_vals, -1, compute_dtype,
                                   keep_inputs=True)
            d_raw = (d_raw_sl[0] if G == 1 else
                     jnp.concatenate(d_raw_sl, axis=1))
            _trunk_bwd_accum(d_raw, w_vals, inputs, -1, compute_dtype,
                             dw_refs)

    return kernel


def _row_spec(rows, tile):
    return pl.BlockSpec((rows, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pad_t(x, pad, cv=0.0):
    return jnp.pad(x, ((0, pad), (0, 0)), constant_values=cv).T


def _parse_static(static):
    """(freq_degree, skip_layer, grid_bound, opaque_last, density_bias
    [, cp_rank, cp_res]) — the 5-tuple form is the cp_rank=0 flagship."""
    if len(static) == 5:
        return (*static, 0, 0)
    return static


def _split_params(params, cp_rank):
    """*params = trunk layers then (when cp_rank>0) the 3 CP bases."""
    if cp_rank:
        return params[:-3], params[-3:]
    return params, ()


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def final_level_train(static, rays_o, rays_d, real_bins, sh, *params):
    """Differentiable fused final level.  static = (freq_degree, skip_layer,
    grid_bound, opaque_last, density_bias[, cp_rank, cp_res]).  *params =
    trunk weights, then (cp_rank > 0) the three CP basis matrices
    [cp_res, cp_rank].  Returns (f_image [N, C], depth [N],
    weights_sum [N], weights [N, T]).  Grads flow ONLY to *params."""
    out, _ = _final_train_fwd_impl(static, rays_o, rays_d, real_bins, sh,
                                   params)
    return out


def _final_train_fwd_impl(static, rays_o, rays_d, real_bins, sh, params):
    freq_degree, skip_layer, grid_bound, opaque_last, db, cp_rank, cp_res = \
        _parse_static(static)
    ws, cps = _split_params(params, cp_rank)
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    G = _pick_group(T, GROUP_FWD)
    # CP adds ~3x [CP_CHUNK, G*R] + [rank, G*R] fp32 transients per group
    # pass; halve the ray tile to stay inside scoped VMEM
    r_tile = R_TILE_TRAIN // 2 if cp_rank else R_TILE_TRAIN
    pad = (-N) % r_tile
    ot, dt = _pad_t(rays_o, pad), _pad_t(rays_d, pad)
    bt = _pad_t(real_bins, pad, cv=1.0)
    st = _pad_t(sh, pad)
    Np = ot.shape[1]
    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    cbt = [c.T for c in cps]
    C = 15 + sh.shape[1]

    kernel = _make_final_train_kernel(T, G, n_layers, skip_layer,
                                      freq_degree, grid_bound, opaque_last,
                                      db, jnp.bfloat16,
                                      cp_rank=cp_rank, cp_res=cp_res)
    f_img, depth, wsum, w_out = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=(Np // r_tile,),
        in_specs=[_const_spec(Pf.shape)]
        + [_row_spec(r, r_tile) for r in (3, 3, T + 1, sh.shape[1])]
        + [_const_spec(w.shape) for w in wts]
        + [_const_spec(c.shape) for c in cbt],
        out_specs=(
            _row_spec(C, r_tile),
            _row_spec(1, r_tile),
            _row_spec(1, r_tile),
            _row_spec(T, r_tile),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((T, Np), jnp.float32),
        ),
    )(Pf, ot, dt, bt, st, *wts, *cbt)
    out = (f_img.T[:N], depth[0, :N], wsum[0, :N], w_out.T[:N])
    return out, (rays_o, rays_d, real_bins, sh, params)


def _final_train_fwd(static, rays_o, rays_d, real_bins, sh, *params):
    return _final_train_fwd_impl(static, rays_o, rays_d, real_bins, sh,
                                 params)


def _final_train_bwd(static, res, g):
    freq_degree, skip_layer, grid_bound, opaque_last, db, cp_rank, cp_res = \
        _parse_static(static)
    rays_o, rays_d, real_bins, sh, params = res
    ws, cps = _split_params(params, cp_rank)
    g_f, g_depth, g_wsum, g_w = g
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    G = _pick_group(T, GROUP_BWD_FINAL)
    pad = (-N) % R_TILE_BWD_FINAL
    ot, dt = _pad_t(rays_o, pad), _pad_t(rays_d, pad)
    bt = _pad_t(real_bins, pad, cv=1.0)
    st = _pad_t(sh, pad)
    # padded rays contribute zero grad because their upstream grads are 0
    gft = _pad_t(g_f, pad)
    gdt = _pad_t(g_depth[:, None], pad)
    gwst = _pad_t(g_wsum[:, None], pad)
    gwt = _pad_t(g_w, pad)
    Np = ot.shape[1]
    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]
    cbt = [c.T for c in cps]
    C = 15 + sh.shape[1]

    kernel = _make_final_bwd_kernel(T, G, n_layers, skip_layer, freq_degree,
                                    grid_bound, opaque_last, db, jnp.bfloat16,
                                    cp_rank=cp_rank, cp_res=cp_res)
    in_specs = (
        [_const_spec(Pf.shape)]
        + [_row_spec(r, R_TILE_BWD_FINAL) for r in (3, 3, T + 1, sh.shape[1])]
        + [_const_spec(w.shape) for w in wts]
        + [_const_spec(c.shape) for c in cbt]
        + [_row_spec(r, R_TILE_BWD_FINAL) for r in (C, 1, 1, T)]
    )
    douts = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=(Np // R_TILE_BWD_FINAL,),
        in_specs=in_specs,
        out_specs=tuple(_const_spec(w.shape) for w in wts)
        + tuple(_const_spec(c.shape) for c in cbt),
        out_shape=tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts
        ) + tuple(
            jax.ShapeDtypeStruct(c.shape, jnp.float32) for c in cbt
        ),
    )(Pf, ot, dt, bt, st, *wts, *cbt, gft, gdt, gwst, gwt)
    d_params = tuple(d.T for d in douts)
    zeros = (jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
             jnp.zeros_like(real_bins), jnp.zeros_like(sh))
    return zeros + d_params


final_level_train.defvjp(_final_train_fwd, _final_train_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def prop_level_train(static, rays_o, rays_d, real_bins, *ws):
    """Differentiable fused proposal level.  static = (freq_degree,
    grid_bound, opaque_last, density_bias).  Returns weights [N, T];
    grads flow to ws."""
    out, _ = _prop_train_fwd_impl(static, rays_o, rays_d, real_bins, ws)
    return out


def _prop_train_fwd_impl(static, rays_o, rays_d, real_bins, ws):
    freq_degree, grid_bound, opaque_last, db = static
    w = fused_prop_level(rays_o, rays_d, real_bins, list(ws), freq_degree,
                         grid_bound, opaque_last=opaque_last,
                         density_bias=db)
    return w, (rays_o, rays_d, real_bins, ws)


def _prop_train_fwd(static, rays_o, rays_d, real_bins, *ws):
    return _prop_train_fwd_impl(static, rays_o, rays_d, real_bins, ws)


def _prop_train_bwd(static, res, g_w):
    freq_degree, grid_bound, opaque_last, db = static
    rays_o, rays_d, real_bins, ws = res
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    G = _pick_group(T, GROUP_BWD_PROP)
    pad = (-N) % R_TILE_BWD
    ot, dt = _pad_t(rays_o, pad), _pad_t(rays_d, pad)
    bt = _pad_t(real_bins, pad, cv=1.0)
    gwt = _pad_t(g_w, pad)
    Np = ot.shape[1]
    Pf = jnp.asarray(_freq_rows_matrix(3, freq_degree))
    wts = [w.T for w in ws]

    kernel = _make_prop_bwd_kernel(T, G, n_layers, freq_degree, grid_bound,
                                   opaque_last, db, jnp.bfloat16)
    in_specs = (
        [_const_spec(Pf.shape)]
        + [_row_spec(r, R_TILE_BWD) for r in (3, 3, T + 1)]
        + [_const_spec(w.shape) for w in wts]
        + [_row_spec(T, R_TILE_BWD)]
    )
    dwts = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        compiler_params=_COMPILER_PARAMS,
        grid=(Np // R_TILE_BWD,),
        in_specs=in_specs,
        out_specs=tuple(_const_spec(w.shape) for w in wts),
        out_shape=tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wts
        ),
    )(Pf, ot, dt, bt, *wts, gwt)
    zeros = (jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
             jnp.zeros_like(real_bins))
    return zeros + tuple(dw.T for dw in dwts)


prop_level_train.defvjp(_prop_train_fwd, _prop_train_bwd)
# registered down here: the bwd delegates to _prop_train_bwd above
prop_level_train_sample.defvjp(_prop_train_sample_fwd,
                               _prop_train_sample_bwd)
