"""On-device ray generation and sampling.

Reference semantics: nerf/utils.py:183-304 (`get_rays`).
  - pixel centers: x = col + 0.5, y = row + 0.5
  - OpenGL-style camera: dirs = ((x-cx)/fx, -(y-cy)/fy, -1), UNNORMALIZED so
    composited depth is z-distance (nerf/utils.py:272-277)
  - rays_d = dirs @ R^T (world), rays_o = pose translation
  - sampling modes: explicit coords / random / error-map importance (with
    jitter inside the coarse cell, returning inds_coarse) / patch sampling

TPU-first: everything is a pure function of (key, poses, intrinsics) so ray
sampling lives INSIDE the jitted train step — the dataset arrays never leave
the device (the reference preloads to GPU and samples per step too, but on
the host side of the step).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dirs_from_pixels(x, y, intrinsics):
    """x, y: [...] pixel-center coords; intrinsics: [4] (fx, fy, cx, cy)
    shared, or [..., 4] per-ray (heterogeneous cameras, e.g. COLMAP scenes
    with several camera models — reference collate carries per-view
    intrinsics, nerf/provider.py:918)."""
    intrinsics = jnp.asarray(intrinsics)
    if intrinsics.ndim == 1:
        fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                          intrinsics[3])
    else:
        fx, fy, cx, cy = (intrinsics[..., 0], intrinsics[..., 1],
                          intrinsics[..., 2], intrinsics[..., 3])
    xs = (x - cx) / fx
    ys = -(y - cy) / fy  # y flipped
    zs = -jnp.ones_like(xs)  # z flipped
    return jnp.stack([xs, ys, zs], axis=-1)


def rays_from_pixels(poses, intrinsics, x, y):
    """poses: [N, 4, 4] or [4, 4] cam2world; x, y: [N] pixel centers.
    Returns rays_o, rays_d: [N, 3]."""
    dirs = dirs_from_pixels(x, y, intrinsics)  # [N, 3]
    if poses.ndim == 2:
        rot = poses[:3, :3]
        rays_d = dirs @ rot.T
        rays_o = jnp.broadcast_to(poses[:3, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nij,nj->ni", poses[:, :3, :3], dirs)
        rays_o = poses[:, :3, 3]
    return rays_o, rays_d


def full_frame_rays(pose, intrinsics, H: int, W: int):
    """All H*W rays of one view, row-major. Returns [H*W, 3] x2."""
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    x = xx.reshape(-1) + 0.5
    y = yy.reshape(-1) + 0.5
    return rays_from_pixels(pose, intrinsics, x, y)


def sample_random_pixels(key, H: int, W: int, n: int):
    """Uniform pixel indices (may duplicate, like torch.randint)."""
    inds = jax.random.randint(key, (n,), 0, H * W)
    x = (inds % W).astype(jnp.float32) + 0.5
    y = (inds // W).astype(jnp.float32) + 0.5
    return inds, x, y


def sample_error_map_pixels(key, error_map, H: int, W: int, n: int,
                            map_size: int = 128):
    """Importance-sample n pixels from a [map_size**2] error map without
    replacement (Gumbel top-k), then jitter uniformly inside each coarse
    cell.  Reference: nerf/utils.py:247-258 (torch.multinomial + jitter).
    Returns (inds [n], x [n], y [n], inds_coarse [n])."""
    k1, k2, k3 = jax.random.split(key, 3)
    logits = jnp.log(jnp.maximum(error_map, 1e-12))
    g = logits + jax.random.gumbel(k1, logits.shape)
    _, inds_coarse = jax.lax.top_k(g, n)
    cx = inds_coarse // map_size
    cy = inds_coarse % map_size
    sx = H / map_size
    sy = W / map_size
    x_row = jnp.clip(
        (cx * sx + jax.random.uniform(k2, (n,)) * sx).astype(jnp.int32), 0, H - 1
    )
    y_col = jnp.clip(
        (cy * sy + jax.random.uniform(k3, (n,)) * sy).astype(jnp.int32), 0, W - 1
    )
    inds = x_row * W + y_col
    # NOTE reference naming: its inds_x indexes rows (H), inds_y columns (W)
    x = (inds % W).astype(jnp.float32) + 0.5
    y = (inds // W).astype(jnp.float32) + 0.5
    return inds, x, y, inds_coarse


def sample_patch_pixels(key, H: int, W: int, patch_size: int, num_patches: int,
                        error_map: Optional[jnp.ndarray] = None,
                        map_size: int = 128):
    """Sample `num_patches` patches of patch_size^2 pixels.  With an error
    map, patch centers follow the incoherence mask (nerf/utils.py:215-244);
    otherwise top-left corners are uniform.  Returns flat inds [P*S*S]."""
    if error_map is not None:
        k1, k2 = jax.random.split(key)
        logits = jnp.log(jnp.maximum(error_map, 1e-12))
        g = logits + jax.random.gumbel(k1, (num_patches,) + logits.shape)
        centers = jnp.argmax(g, axis=-1)  # [P] with replacement across patches
        cx = centers // map_size
        cy = centers % map_size
        sx, sy = H / map_size, W / map_size
        x0 = jnp.clip((cx * sx - patch_size // 2).astype(jnp.int32), 0,
                      H - patch_size - 1)
        y0 = jnp.clip((cy * sy - patch_size // 2).astype(jnp.int32), 0,
                      W - patch_size - 1)
    else:
        k1, k2 = jax.random.split(key)
        x0 = jax.random.randint(k1, (num_patches,), 0, H - patch_size)
        y0 = jax.random.randint(k2, (num_patches,), 0, W - patch_size)
    pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                          indexing="ij")
    offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [S*S, 2]
    rows = x0[:, None] + offs[None, :, 0]
    cols = y0[:, None] + offs[None, :, 1]
    inds = (rows * W + cols).reshape(-1)
    return inds


def coarse_inds_from_fine(inds, H: int, W: int, map_size: int = 128):
    """Map fine pixel indices to coarse error-map cells
    (nerf/utils.py:294-300)."""
    rows = inds // W
    cols = inds % W
    cr = (rows * (map_size / H)).astype(jnp.int32)
    cc = (cols * (map_size / W)).astype(jnp.int32)
    return cr * map_size + cc
