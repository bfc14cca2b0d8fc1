"""Sharded evaluation: render rays sharded over the mesh data axis and
reduce metrics with explicit psum collectives.

TPU-native replacement for the reference's dead dist.all_reduce /
all_gather eval path (nerf/trainer.py:1577-1601) — without replicating its
bug where preds_extra gathers preds_depth (:1595).  Here the reduction is
inside one jitted shard_map: each device renders its ray shard, computes
the partial squared error, and the scalars ride a psum over ICI.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render.renderer import RenderSettings, render_rays


def make_sharded_eval_step(model, settings: RenderSettings, mesh: Mesh,
                           axis: str = "data"):
    """Returns eval_step(params, rays_o, rays_d, gt_rgb) -> {mse, psnr,
    image}: rays/gt sharded over `axis`, params replicated, metrics
    psum-reduced.  Ray count must be divisible by the mesh axis size."""

    def per_shard(params, rays_o, rays_d, gt_rgb):
        out = nn.apply(lambda f, *a, **k: render_rays(f, *a, **k), model)(
            params, rays_o, rays_d, settings, bg_color=1.0
        )
        pred = out["image"]
        se = jnp.sum((pred - gt_rgb[..., :3]) ** 2)
        n = jnp.asarray(pred.size, jnp.float32)
        se = jax.lax.psum(se, axis)
        n = jax.lax.psum(n, axis)
        mse = se / n
        return {"mse": mse,
                "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
                "image": pred}

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs={"mse": P(), "psnr": P(), "image": P(axis)},
        check_vma=False,
    )
    return jax.jit(sharded)
