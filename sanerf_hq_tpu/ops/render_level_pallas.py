"""Megakernel for the FINAL render level (inference fast path).

Fuses, per ray tile, the entire final-level pipeline in VMEM:
  sample positions -> contraction -> freq-MLP trunk -> density activation ->
  alpha compositing -> feature/depth accumulation
so none of the per-sample intermediates (xyz [N,T,3], features [N,T,16],
colors [N,T,31], sigmas/weights [N,T]) ever touch HBM.  Lanes hold RAYS;
the sample loop is statically unrolled, giving cheap sequential
transmittance accumulation in registers (a cumsum over samples is exactly
what the lane-parallel layout cannot vectorize, and exactly what a serial
register loop does for free).

Inference-only: the training path keeps the composable XLA renderer
(render_rays) whose autodiff is exercised by the test suite.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _freq_expansion_matrix

R_TILE = 4096  # rays per grid step


def _make_kernel(T: int, n_layers: int, skip_layer: int, freq_degree: int,
                 grid_bound: float, opaque_last: bool, compute_dtype):
    D = 3

    def kernel(p_ref, o_ref, d_ref, bins_ref, sh_ref, *refs):
        w_refs = refs[:n_layers]
        fimg_ref, depth_ref, wsum_ref = refs[n_layers:n_layers + 3]

        o = o_ref[:].astype(jnp.float32)       # [3, R]
        dd = d_ref[:].astype(jnp.float32)      # [3, R]
        sh = sh_ref[:].astype(jnp.float32)     # [16, R]
        R = o.shape[1]

        f_img = jnp.zeros((15 + sh.shape[0], R), jnp.float32)
        depth = jnp.zeros((1, R), jnp.float32)
        wsum = jnp.zeros((1, R), jnp.float32)
        accum = jnp.zeros((1, R), jnp.float32)

        for s in range(T):
            b0 = bins_ref[s:s + 1, :]          # [1, R]
            b1 = bins_ref[s + 1:s + 2, :]
            t_s = (b0 + b1) * 0.5
            delta = b1 - b0

            xyz = o + dd * t_s                 # [3, R]
            # inf-norm contraction (ops/contraction.py semantics)
            ax = jnp.abs(xyz)
            mag = jnp.max(ax, axis=0, keepdims=True)
            is_max = ax == mag
            inv = 1.0 / jnp.maximum(mag, 1e-38)
            scale = jnp.where(is_max, (2.0 - inv) * inv, inv)
            xyz = jnp.where(mag < 1.0, xyz, xyz * scale)
            xyz = xyz / grid_bound

            # freq encode via expansion matmul + iota-masked sin/cos
            a = jnp.dot(p_ref[:], xyz, preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
            sin_end = D + freq_degree * D
            h = jnp.where((row >= D) & (row < sin_end), jnp.sin(a),
                          jnp.where(row >= sin_end, jnp.cos(a), a))
            h = h.astype(compute_dtype)
            h_in = h
            for l in range(n_layers):
                if l == skip_layer:
                    h = jnp.concatenate([h, h_in], axis=0)
                w = w_refs[l][:].astype(compute_dtype)
                h = jnp.dot(w, h, preferred_element_type=jnp.float32)
                if l != n_layers - 1:
                    h = jnp.maximum(h, 0.0).astype(compute_dtype)
            # h: [16, R] fp32 — row 0 raw density, rows 1..15 geo features
            sigma = jnp.exp(jnp.clip(h[0:1, :], -30.0, 15.0))
            if opaque_last and s == T - 1:
                ds = jnp.full_like(sigma, jnp.inf)
            else:
                ds = delta * sigma
            alpha = 1.0 - jnp.exp(-ds)
            w_s = alpha * jnp.exp(-accum)
            accum = accum + ds

            color = jnp.concatenate([h[1:, :], sh], axis=0)  # [31, R]
            f_img = f_img + w_s * color
            depth = depth + w_s * t_s
            wsum = wsum + w_s

        fimg_ref[:] = f_img
        depth_ref[:] = depth
        wsum_ref[:] = wsum

    return kernel


def fused_final_level(rays_o, rays_d, real_bins, sh, ws: Sequence,
                      freq_degree: int, skip_layer: int, grid_bound: float,
                      opaque_last: bool = True):
    """rays_o/rays_d: [N, 3]; real_bins: [N, T+1]; sh: [N, 16] per-ray
    direction encoding; ws: trunk kernels [in, out].
    Returns (f_image [N, 31], depth [N], weights_sum [N])."""
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    pad = (-N) % R_TILE
    ot = jnp.pad(rays_o, ((0, pad), (0, 0))).T           # [3, N']
    dt = jnp.pad(rays_d, ((0, pad), (0, 0))).T
    bt = jnp.pad(real_bins, ((0, pad), (0, 0)),
                 constant_values=1.0).T                  # [T+1, N']
    st = jnp.pad(sh, ((0, pad), (0, 0))).T               # [16, N']
    Np = ot.shape[1]
    grid = (Np // R_TILE,)

    P = jnp.asarray(_freq_expansion_matrix(3, freq_degree)).T  # [F, 3]
    wts = [w.T for w in ws]

    kernel = _make_kernel(T, n_layers, skip_layer, freq_degree, grid_bound,
                          opaque_last, jnp.bfloat16)
    C = 15 + sh.shape[1]
    f_img, depth, wsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(P.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sh.shape[1], R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in wts
        ],
        out_specs=(
            pl.BlockSpec((C, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
    )(P, ot, dt, bt, st, *wts)
    return f_img.T[:N], depth[0, :N], wsum[0, :N]


# ---------------------------------------------------------------------------
# Proposal-level megakernel: same fusion (geometry + prop MLP + alpha
# compositing) but emits the per-sample WEIGHTS [N, T] that sample_pdf
# consumes, instead of composited features.
# ---------------------------------------------------------------------------

def _make_prop_kernel(T: int, n_layers: int, freq_degree: int,
                      grid_bound: float, opaque_last: bool, compute_dtype):
    D = 3

    def kernel(p_ref, o_ref, d_ref, bins_ref, *refs):
        w_refs = refs[:n_layers]
        wout_ref = refs[n_layers]

        o = o_ref[:].astype(jnp.float32)
        dd = d_ref[:].astype(jnp.float32)
        R = o.shape[1]
        accum = jnp.zeros((1, R), jnp.float32)

        for s in range(T):
            b0 = bins_ref[s:s + 1, :]
            b1 = bins_ref[s + 1:s + 2, :]
            t_s = (b0 + b1) * 0.5
            delta = b1 - b0

            xyz = o + dd * t_s
            ax = jnp.abs(xyz)
            mag = jnp.max(ax, axis=0, keepdims=True)
            is_max = ax == mag
            inv = 1.0 / jnp.maximum(mag, 1e-38)
            scale = jnp.where(is_max, (2.0 - inv) * inv, inv)
            xyz = jnp.where(mag < 1.0, xyz, xyz * scale) / grid_bound

            a = jnp.dot(p_ref[:], xyz, preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
            sin_end = D + freq_degree * D
            h = jnp.where((row >= D) & (row < sin_end), jnp.sin(a),
                          jnp.where(row >= sin_end, jnp.cos(a), a))
            h = h.astype(compute_dtype)
            for l in range(n_layers):
                w = w_refs[l][:].astype(compute_dtype)
                h = jnp.dot(w, h, preferred_element_type=jnp.float32)
                if l != n_layers - 1:
                    h = jnp.maximum(h, 0.0).astype(compute_dtype)
            sigma = jnp.exp(jnp.clip(h[0:1, :], -30.0, 15.0))
            if opaque_last and s == T - 1:
                ds = jnp.full_like(sigma, jnp.inf)
            else:
                ds = delta * sigma
            alpha = 1.0 - jnp.exp(-ds)
            wout_ref[s:s + 1, :] = alpha * jnp.exp(-accum)
            accum = accum + ds

    return kernel


def fused_prop_level(rays_o, rays_d, real_bins, ws: Sequence,
                     freq_degree: int, grid_bound: float,
                     opaque_last: bool = True):
    """Returns per-sample compositing weights [N, T] of a proposal level."""
    N = rays_o.shape[0]
    T = real_bins.shape[1] - 1
    n_layers = len(ws)
    pad = (-N) % R_TILE
    ot = jnp.pad(rays_o, ((0, pad), (0, 0))).T
    dt = jnp.pad(rays_d, ((0, pad), (0, 0))).T
    bt = jnp.pad(real_bins, ((0, pad), (0, 0)), constant_values=1.0).T
    Np = ot.shape[1]
    grid = (Np // R_TILE,)

    P = jnp.asarray(_freq_expansion_matrix(3, freq_degree)).T
    wts = [w.T for w in ws]
    kernel = _make_prop_kernel(T, n_layers, freq_degree, grid_bound,
                               opaque_last, jnp.bfloat16)
    wout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(P.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(P, ot, dt, bt, *wts)
    return wout.T[:N]
