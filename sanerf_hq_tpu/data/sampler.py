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

from .rays import rays_from_pixels, sample_random_pixels


def sample_rgb_batch(key, images, poses, intrinsics, n_rays: int,
                     random_image_batch: bool = True):
    """images: [V, H, W, C], poses: [V, 4, 4], intrinsics: [4].
    Returns dict(rays_o, rays_d, gt_rgb) each [n_rays, ...].

    random_image_batch=True samples every ray from a random view
    (main.py flag; nerf/provider.py:899-913); False uses a single random
    view per step."""
    V, H, W = images.shape[0], images.shape[1], images.shape[2]
    kimg, kpix = jax.random.split(key)
    if random_image_batch:
        img_inds = jax.random.randint(kimg, (n_rays,), 0, V)
    else:
        img_inds = jnp.full((n_rays,), jax.random.randint(kimg, (), 0, V))
    pix_inds, x, y = sample_random_pixels(kpix, H, W, n_rays)
    rows = pix_inds // W
    cols = pix_inds % W
    rays_o, rays_d = rays_from_pixels(poses[img_inds], intrinsics, x, y)
    gt = images[img_inds, rows, cols]
    return {"rays_o": rays_o, "rays_d": rays_d, "gt_rgb": gt,
            "img_inds": img_inds, "pix_inds": pix_inds}
