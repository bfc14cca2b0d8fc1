"""Multiresolution hash-grid encoder (Instant-NGP style), TPU-native.

Reference semantics: gridencoder/src/gridencoder.cu + gridencoder/grid.py.
  - per-level resolution R_l = ceil(base * scale^l)  (grid.py:128)
  - per-level table size  = min(2^log2_hashmap_size, R^D) rounded up to a
    multiple of 8 (grid.py:129-130)
  - dense indexing while R^D fits in the level's table, else a spatial hash
    xor(pos_d * prime_d) with primes {1, 2654435761, 805459861, 3674653429,
    2097192037, 1434869437, 2165219737}  (gridencoder.cu:45-79)
  - align_corners=False pixel-center convention: pos = clip(x*R - 0.5, 0, R-1)
    (gridencoder.cu:148)
  - inputs outside [0, 1] produce zero output and zero gradient
    (gridencoder.cu:105-130)
  - linear or smoothstep corner interpolation (gridencoder.cu:35-41,154-159)
  - parameters initialized U(-1e-4, 1e-4)  (grid.py:144-146)

TPU-first design: the forward pass is 2^D corner gathers per level expressed
as XLA gathers over a single flat [total_params, C] table; the backward pass
is the gather transpose — a *deterministic* scatter-add (a strict improvement
over the reference's unordered CUDA atomicAdd).  All level metadata is static
Python, so the whole thing traces to fixed shapes under jit/pjit.

The reference's side-channel TV / weight-decay gradient kernels
(gridencoder.cu:525-713) are re-designed as ordinary differentiable loss
terms: `total_variation_loss` and `weight_decay_loss` below — same math,
composable with autodiff instead of post-backward grad injection.
"""
from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = None
    gridtype: str = "hash"  # "hash" | "tiled"
    interpolation: str = "linear"  # "linear" | "smoothstep"
    align_corners: bool = False
    # TPU-native packed-corner variant: each table row stores ALL 2^D corner
    # features of one grid cell, so a lookup is ONE gather of a (2^D * C)-wide
    # row instead of 2^D separate gathers.  XLA gather cost on TPU is
    # per-ROW (scalar-issue bound, ~177M rows/s regardless of row width, see
    # docs/PERF.md), so this is an ~8x speedup at 8x parameter memory.
    # Different function class than Instant-NGP (corners are per-cell, not
    # shared) — a TPU-first accelerated mode, not the parity encoder.
    packed: bool = False

    @property
    def scale(self) -> float:
        if self.desired_resolution is not None:
            return float(
                np.exp2(
                    np.log2(self.desired_resolution / self.base_resolution)
                    / (self.num_levels - 1)
                )
            )
        return float(self.per_level_scale)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def max_params(self) -> int:
        return 2 ** self.log2_hashmap_size

    def level_meta(self) -> Tuple[Tuple[int, int, int, bool], ...]:
        """Per level: (resolution, offset, size, use_hash)."""
        meta = []
        offset = 0
        for lvl in range(self.num_levels):
            res = int(np.ceil(self.base_resolution * self.scale ** lvl))
            size = min(self.max_params, res ** self.input_dim)
            size = int(np.ceil(size / 8) * 8)
            # replicate the CUDA stride loop to decide dense vs hash
            stride = 1
            for _ in range(self.input_dim):
                if stride > size:
                    break
                stride *= res
            use_hash = self.gridtype == "hash" and stride > size
            meta.append((res, offset, size, use_hash))
            offset += size
        return tuple(meta)

    @property
    def total_params(self) -> int:
        meta = self.level_meta()
        return meta[-1][1] + meta[-1][2]

    @property
    def row_dim(self) -> int:
        return self.level_dim * (2 ** self.input_dim if self.packed else 1)


# One-hot-matmul backward for SMALL DENSE levels (VERDICT r4 #10 /
# docs/PERF.md "Hash-grid backward strategies"): grad_table = onehot(idx)^T
# @ g is MXU work at 307 M upd/s vs scatter_add's 24.9 M upd/s, but its
# cost scales with table rows — parity at ~64k rows, so only levels with
# size <= this threshold take the matmul path.  SANERF_HASH_ONEHOT_ROWS=0
# disables it (pure scatter_add backward everywhere).
_ONEHOT_MAX_ROWS = int(os.environ.get("SANERF_HASH_ONEHOT_ROWS", 16384))


@jax.custom_vjp
def _take_onehot_bwd(table, idx):
    """jnp.take(table, idx, 0) whose BACKWARD is a chunked one-hot matmul
    instead of scatter_add.  table: [rows, C]; idx: [B] int32."""
    return jnp.take(table, idx, axis=0)


def _take_onehot_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _take_onehot_back(res, g):
    idx, rows = res
    B = idx.shape[0]
    C = g.shape[-1]
    # chunk so the materialized one-hot [CH, rows] stays ~32M elements
    ch = min(B, max(512, (1 << 25) // max(rows, 1)))
    pad = (-B) % ch
    idx_p = jnp.pad(idx, (0, pad))  # padded grads are zero -> no effect
    g_p = jnp.pad(g, ((0, pad), (0, 0)))
    iota = jnp.arange(rows, dtype=jnp.int32)

    def body(acc, xs):
        i, gg = xs
        oh = (i[:, None] == iota[None, :]).astype(jnp.float32)  # [ch, rows]
        return acc + jnp.einsum(
            "br,bc->rc", oh, gg.astype(jnp.float32),
            preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((rows, C), jnp.float32)
    grad, _ = jax.lax.scan(
        body, acc0, (idx_p.reshape(-1, ch), g_p.reshape(-1, ch, C)))
    return grad.astype(g.dtype), np.zeros(idx.shape, jax.dtypes.float0)


_take_onehot_bwd.defvjp(_take_onehot_fwd, _take_onehot_back)


def init_hash_table(key, spec: HashGridSpec, dtype=jnp.float32):
    """U(-1e-4, 1e-4) init, matching grid.py:144-146."""
    return jax.random.uniform(
        key, (spec.total_params, spec.row_dim), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _level_index(corner: jnp.ndarray, res: int, size: int, use_hash: bool,
                 input_dim: int) -> jnp.ndarray:
    """corner: [..., D] int32 grid coords -> flat index [...] int32.

    Mirrors get_grid_index (gridencoder.cu:62-80) with static res/size."""
    c = corner.astype(jnp.uint32)
    if use_hash:
        idx = jnp.zeros(corner.shape[:-1], dtype=jnp.uint32)
        for d in range(input_dim):
            idx = idx ^ (c[..., d] * jnp.uint32(_PRIMES[d]))
        idx = idx % jnp.uint32(size)
    else:
        # dense / tiled: stride loop with early stop once stride > size
        idx = jnp.zeros(corner.shape[:-1], dtype=jnp.uint32)
        stride = 1
        for d in range(input_dim):
            if stride > size:
                break
            idx = idx + c[..., d] * jnp.uint32(stride)
            stride *= res
        idx = idx % jnp.uint32(size)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("spec", "max_level"))
def hash_encode_unit(table, x, spec: HashGridSpec, max_level: Optional[int] = None):
    """Encode unit-cube coords x: [..., D] in [0, 1] -> [..., L*C].

    `table`: [total_params, C].  Levels >= max_level output zeros
    (grid.py:41,51-56 partial evaluation)."""
    D = spec.input_dim
    C = spec.level_dim
    L = spec.num_levels
    max_level = L if max_level is None else min(max_level, L)

    prefix = x.shape[:-1]
    x = x.reshape(-1, D).astype(jnp.float32)

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B, 1]
    x_safe = jnp.clip(x, 0.0, 1.0)

    if spec.packed:
        out = _packed_encode(table, x_safe, spec, max_level)
        out = jnp.where(oob, 0.0, out)
        return out.reshape(*prefix, L * C)

    outs = []
    for lvl, (res, offset, size, use_hash) in enumerate(spec.level_meta()):
        if lvl >= max_level:
            outs.append(jnp.zeros((x.shape[0], C), dtype=table.dtype))
            continue
        if spec.align_corners:
            pos = x_safe * (res - 1)
            pos_grid = jnp.minimum(jnp.floor(pos), res - 2).astype(jnp.int32)
        else:
            pos = jnp.clip(x_safe * res - 0.5, 0.0, res - 1)
            pos_grid = jnp.floor(pos).astype(jnp.int32)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)

        ws, flats = [], []
        for cidx in range(1 << D):
            w = jnp.ones((x.shape[0],), dtype=jnp.float32)
            corner = []
            for d in range(D):
                if (cidx >> d) & 1:
                    w = w * frac[:, d]
                    corner.append(jnp.minimum(pos_grid[:, d] + 1, res - 1))
                else:
                    w = w * (1.0 - frac[:, d])
                    corner.append(pos_grid[:, d])
            corner = jnp.stack(corner, axis=-1)  # [B, D]
            ws.append(w)
            flats.append(_level_index(corner, res, size, use_hash, D))
        w_all = jnp.stack(ws)                       # [2^D, B]
        idx_all = jnp.stack(flats).reshape(-1)      # [2^D * B]
        if not use_hash and size <= _ONEHOT_MAX_ROWS:
            # small dense level: slice the level subtable (grad = cheap
            # pad) and gather with the one-hot-matmul backward
            lvl = jax.lax.slice_in_dim(table, offset, offset + size, axis=0)
            vals = _take_onehot_bwd(lvl, idx_all)
        else:
            vals = jnp.take(table, offset + idx_all, axis=0)
        vals = vals.reshape(1 << D, x.shape[0], C).astype(jnp.float32)
        acc = jnp.sum(w_all[..., None] * vals, axis=0)
        outs.append(acc.astype(table.dtype))

    out = jnp.concatenate(outs, axis=-1)  # [B, L*C]
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, L * C)


def hash_encode(table, x, spec: HashGridSpec, bound: float = 1.0,
                max_level: Optional[int] = None):
    """Encode world coords in [-bound, bound] (grid.py:151-156)."""
    x = (x + bound) / (2.0 * bound)
    return hash_encode_unit(table, x, spec, max_level=max_level)


# ---------------------------------------------------------------------------
# Regularizers as differentiable losses (replacing gridencoder.cu:525-713)
# ---------------------------------------------------------------------------

def total_variation_loss(table, spec: HashGridSpec, key, n_samples: int = 8192,
                         bound: float = 1.0):
    """Stochastic total-variation regularizer on the grid values.

    Same math as kernel_grad_tv (gridencoder.cu:525-631): at random points,
    penalize squared differences between adjacent grid corners along each
    axis.  Expressed as a loss so autodiff produces the gradient the CUDA
    kernel injected by hand."""
    D = spec.input_dim
    x = jax.random.uniform(key, (n_samples, D), dtype=jnp.float32)
    loss = 0.0
    for res, offset, size, use_hash in spec.level_meta():
        if spec.align_corners:
            pos_grid = jnp.minimum(
                jnp.floor(x * (res - 1)), res - 2
            ).astype(jnp.int32)
        else:
            pos_grid = jnp.floor(jnp.clip(x * res - 0.5, 0.0, res - 1)).astype(jnp.int32)
        base_idx = offset + _level_index(pos_grid, res, size, use_hash, D)
        base_val = jnp.take(table, base_idx, axis=0)
        for d in range(D):
            nb = pos_grid.at[:, d].set(jnp.minimum(pos_grid[:, d] + 1, res - 1))
            nb_idx = offset + _level_index(nb, res, size, use_hash, D)
            nb_val = jnp.take(table, nb_idx, axis=0)
            loss = loss + jnp.sum((base_val - nb_val) ** 2)
    return loss / n_samples


def weight_decay_loss(table, spec: HashGridSpec):
    """Level-size-normalized L2 decay (zip-nerf style), matching
    kernel_grad_wd (gridencoder.cu:670-713): each level's squared norm is
    divided by that level's parameter count."""
    loss = 0.0
    for res, offset, size, use_hash in spec.level_meta():
        lvl = jax.lax.dynamic_slice_in_dim(table, offset, size, axis=0)
        loss = loss + jnp.sum(lvl ** 2) / size
    return loss


def _packed_encode(table, x, spec: HashGridSpec, max_level: int):
    """Packed-corner lookup: one row gather per (point, level); the row holds
    the cell's 2^D corner features; trilinear weights applied in-register."""
    D = spec.input_dim
    C = spec.level_dim
    B = x.shape[0]
    n_corners = 1 << D

    outs = []
    for lvl, (res, offset, size, use_hash) in enumerate(spec.level_meta()):
        if lvl >= max_level:
            outs.append(jnp.zeros((B, C), dtype=table.dtype))
            continue
        if spec.align_corners:
            pos = x * (res - 1)
            pos_grid = jnp.minimum(jnp.floor(pos), res - 2).astype(jnp.int32)
        else:
            pos = jnp.clip(x * res - 0.5, 0.0, res - 1)
            pos_grid = jnp.floor(pos).astype(jnp.int32)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)

        flat = _level_index(pos_grid, res, size, use_hash, D)
        if not use_hash and size <= _ONEHOT_MAX_ROWS:
            lvl = jax.lax.slice_in_dim(table, offset, offset + size, axis=0)
            rows = _take_onehot_bwd(lvl, flat)  # [B, 2^D * C]
        else:
            rows = jnp.take(table, offset + flat, axis=0)  # [B, 2^D * C]
        rows = rows.reshape(B, n_corners, C).astype(jnp.float32)

        # corner weights: bit d of corner index selects frac[d] vs 1-frac[d]
        w = jnp.ones((B, n_corners), dtype=jnp.float32)
        for d in range(D):
            bit = jnp.asarray([(c >> d) & 1 for c in range(n_corners)],
                              jnp.float32)
            w = w * (bit * frac[:, d:d + 1] + (1.0 - bit) * (1.0 - frac[:, d:d + 1]))
        outs.append(jnp.sum(w[..., None] * rows, axis=1).astype(table.dtype))
    return jnp.concatenate(outs, axis=-1)
