"""Batch samplers that run INSIDE the jitted train step.

Replaces the reference's host-side NeRFDataset.collate (nerf/provider.py:894-
1114): with device-resident arrays (images/poses preloaded, same as the
reference's --preload) the per-step ray selection becomes a pure function of
the PRNG key, fusing into the train step — zero host<->device traffic.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .rays import (
    coarse_inds_from_fine,
    rays_from_pixels,
    sample_error_map_pixels,
    sample_patch_pixels,
    sample_random_pixels,
)


def sample_rgb_batch(key, images, poses, intrinsics, n_rays: int,
                     random_image_batch: bool = True,
                     cam_near_far=None):
    """images: [V, H, W, C], poses: [V, 4, 4], intrinsics: [4] shared or
    [V, 4] per-view.  Returns dict(rays_o, rays_d, gt_rgb) each
    [n_rays, ...], plus cam_near_far [n_rays, 2] when given [V, 2].

    random_image_batch=True samples every ray from a random view
    (main.py flag; nerf/provider.py:899-913); False uses a single random
    view per step.  Per-view intrinsics and sparse-depth near/far follow
    the reference collate, which carries both per selected view
    (nerf/provider.py:918, :1060-1063 -> consumed at
    nerf/renderer.py:231-234)."""
    V, H, W = images.shape[0], images.shape[1], images.shape[2]
    kimg, kpix = jax.random.split(key)
    if random_image_batch:
        img_inds = jax.random.randint(kimg, (n_rays,), 0, V)
    else:
        img_inds = jnp.full((n_rays,), jax.random.randint(kimg, (), 0, V))
    pix_inds, x, y = sample_random_pixels(kpix, H, W, n_rays)
    rows = pix_inds // W
    cols = pix_inds % W
    intrinsics = jnp.asarray(intrinsics)
    intr = intrinsics[img_inds] if intrinsics.ndim == 2 else intrinsics
    rays_o, rays_d = rays_from_pixels(poses[img_inds], intr, x, y)
    gt = images[img_inds, rows, cols]
    batch = {"rays_o": rays_o, "rays_d": rays_d, "gt_rgb": gt,
             "img_inds": img_inds, "pix_inds": pix_inds}
    if cam_near_far is not None:
        batch["cam_near_far"] = jnp.asarray(cam_near_far)[img_inds]
    return batch


def sample_mask_batch(key, masks, poses, intrinsics, error_map, n_rays: int,
                      num_local: int, patch_size: int, H: int, W: int,
                      error_map_size: int = 128,
                      use_error_map: bool = True):
    """Stage-3 batch: error-map-guided global rays + local patches
    (nerf/provider.py:894-1114 mask path).  Fixed intrinsics (fovy 60 at
    online_resolution in the reference; here the caller passes whichever
    intrinsics apply).  masks: [V, H, W] int labels.

    Returns dict with rays (global then local), gt_masks, img_inds,
    inds_coarse (global) and local_error (local ray error-map values)."""
    V = poses.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    # global rays: one ray per random view, error-map importance per view
    img_inds = jax.random.randint(k1, (n_rays,), 0, V)
    if use_error_map:
        # per-ray sampling over the per-view error map: use gumbel argmax on
        # the selected view's map (with replacement across rays)
        logits = jnp.log(jnp.maximum(error_map[img_inds], 1e-12))  # [N, S*S]
        g = logits + jax.random.gumbel(k2, logits.shape)
        inds_coarse = jnp.argmax(g, axis=-1)
        sx = H / error_map_size
        sy = W / error_map_size
        rows = jnp.clip(((inds_coarse // error_map_size) * sx
                         + jax.random.uniform(k3, (n_rays,)) * sx)
                        .astype(jnp.int32), 0, H - 1)
        cols = jnp.clip(((inds_coarse % error_map_size) * sy
                         + jax.random.uniform(k4, (n_rays,)) * sy)
                        .astype(jnp.int32), 0, W - 1)
        pix = rows * W + cols
    else:
        pix, _, _ = sample_random_pixels(k2, H, W, n_rays)
        rows, cols = pix // W, pix % W
        inds_coarse = coarse_inds_from_fine(pix, H, W, error_map_size)
    x = cols.astype(jnp.float32) + 0.5
    y = rows.astype(jnp.float32) + 0.5
    rays_o, rays_d = rays_from_pixels(poses[img_inds], intrinsics, x, y)
    gt_g = masks[img_inds, rows, cols]

    # local patches from random views, centers at incoherent regions
    S2 = patch_size * patch_size
    local_views = jax.random.randint(k5, (num_local,), 0, V)
    local_view_rep = jnp.repeat(local_views, S2)
    lk = jax.random.fold_in(key, 7)
    if use_error_map:
        lmaps = error_map[local_views]  # [P, S*S]
        lg = jnp.log(jnp.maximum(lmaps, 1e-12)) + jax.random.gumbel(
            lk, lmaps.shape)
        centers = jnp.argmax(lg, axis=-1)
        sx, sy = H / error_map_size, W / error_map_size
        x0 = jnp.clip(((centers // error_map_size) * sx - patch_size // 2)
                      .astype(jnp.int32), 0, H - patch_size - 1)
        y0 = jnp.clip(((centers % error_map_size) * sy - patch_size // 2)
                      .astype(jnp.int32), 0, W - patch_size - 1)
    else:
        ka, kb = jax.random.split(lk)
        x0 = jax.random.randint(ka, (num_local,), 0, H - patch_size)
        y0 = jax.random.randint(kb, (num_local,), 0, W - patch_size)
    pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                          indexing="ij")
    lrows = (x0[:, None] + pi.reshape(-1)[None, :]).reshape(-1)
    lcols = (y0[:, None] + pj.reshape(-1)[None, :]).reshape(-1)
    lx = lcols.astype(jnp.float32) + 0.5
    ly = lrows.astype(jnp.float32) + 0.5
    lro, lrd = rays_from_pixels(poses[local_view_rep], intrinsics, lx, ly)
    gt_l = masks[local_view_rep, lrows, lcols]
    scale = error_map_size / H
    l_coarse = ((lrows.astype(jnp.float32) * scale).astype(jnp.int32)
                * error_map_size
                + (lcols.astype(jnp.float32) * scale).astype(jnp.int32))
    local_error = error_map[local_view_rep, l_coarse]

    return {
        "rays_o": jnp.concatenate([rays_o, lro], axis=0),
        "rays_d": jnp.concatenate([rays_d, lrd], axis=0),
        "gt_masks": jnp.concatenate([gt_g, gt_l], axis=0),
        "img_inds": img_inds,
        "inds_coarse": inds_coarse,
        "local_error": local_error,
    }


def sam_aug_intrinsics(key, online_resolution: int):
    """Random fovy in [50, 70) deg at online_resolution
    (nerf/provider.py:926-931)."""
    fovy = 50.0 + 20.0 * jax.random.uniform(key, ())
    focal = online_resolution / (2.0 * jnp.tan(0.5 * fovy * jnp.pi / 180.0))
    half = online_resolution / 2.0
    return jnp.stack([focal, focal, half, half])


def fixed_fovy_intrinsics(resolution: int, fovy_deg: float = 60.0):
    import numpy as np

    focal = resolution / (2.0 * np.tan(0.5 * np.deg2rad(fovy_deg)))
    return jnp.asarray([focal, focal, resolution / 2, resolution / 2],
                       jnp.float32)
