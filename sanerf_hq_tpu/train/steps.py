"""Jitted per-step train/eval functions for the three stages.

Reference semantics: nerf/trainer.py train_step branches —
  rgb   :363-399   MSE + lambda_proposal * proposal + lambda_distort *
                   distortion + lambda_entropy * binary entropy of
                   weights_sum; update_proposal cadence step<=3000 or %5==0
  mask  :401-505   CE on softmax mask logits over the first num_rays global
                   samples + label regularization + ray-pair RGB loss on
                   local patches; error-map EMA update
  sam   :507-555   MSE between rendered 64x64 feature map (bilinear-resized)
                   and the cached/encoder ground-truth features

TPU-first: each stage is ONE jitted function (ray sampling happens upstream,
data stays device-resident); step-dependent cadences enter as traced scalars
so there is exactly one executable per stage.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..render.renderer import RenderSettings, render_rays
from .state import TrainState


def _render_apply(model, params, rays_o, rays_d, settings, key, bg_color,
                  cam_near_far, update_proposal):
    return nn.apply(
        lambda f, *a, **k: render_rays(f, *a, **k), model
    )(params, rays_o, rays_d, settings, key=key, bg_color=bg_color,
      cam_near_far=cam_near_far, update_proposal=update_proposal)


def make_rgb_train_step(model, cfg: Config, donate: bool = True):
    """Stage-1 RGB step. batch: rays_o, rays_d [N,3], gt_rgb [N,3/4],
    optional cam_near_far [N,2] or [1,2]."""
    settings = RenderSettings(
        num_steps=tuple(cfg.num_steps),
        use_contract=cfg.contract,
        min_near=cfg.min_near,
        background=cfg.background,
        bound=cfg.bound,
        perturb=True,
        training=True,
        compute_losses=(cfg.lambda_proposal > 0 or cfg.lambda_distort > 0),
    )

    def loss_fn(params, batch, key):
        step = batch["step"]
        update_proposal = (step <= 3000) | (step % 5 == 0)
        images = batch["gt_rgb"]
        if cfg.background == "random":
            bg_color = jax.random.uniform(
                jax.random.fold_in(key, 1), (images.shape[0], 3)
            )
        else:
            bg_color = 1.0
        if images.shape[-1] == 4:
            gt_rgb = images[..., :3] * images[..., 3:] + bg_color * (
                1.0 - images[..., 3:]
            )
        else:
            gt_rgb = images

        out = _render_apply(
            model, params, batch["rays_o"], batch["rays_d"], settings,
            key=jax.random.fold_in(key, 0), bg_color=bg_color,
            cam_near_far=batch.get("cam_near_far"),
            update_proposal=update_proposal,
        )
        pred = out["image"]
        loss = jnp.mean((pred - gt_rgb) ** 2)
        metrics = {"mse": loss}
        if cfg.lambda_proposal > 0:
            loss = loss + cfg.lambda_proposal * out["proposal_loss"]
            metrics["proposal_loss"] = out["proposal_loss"]
        if cfg.lambda_distort > 0:
            loss = loss + cfg.lambda_distort * out["distort_loss"]
            metrics["distort_loss"] = out["distort_loss"]
        if cfg.lambda_entropy > 0:
            w = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
            entropy = -w * jnp.log2(w) - (1 - w) * jnp.log2(1 - w)
            loss = loss + cfg.lambda_entropy * jnp.mean(entropy)
        metrics["loss"] = loss
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(metrics["mse"], 1e-10))
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, key):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, batch, key)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return train_step


def make_eval_render(model, cfg: Config, return_feats: bool = False,
                     return_mask: bool = False):
    """Staged full-frame render for eval/test (chunked, no perturb)."""
    from ..render.renderer import render_staged

    settings = RenderSettings(
        num_steps=tuple(cfg.num_steps),
        use_contract=cfg.contract,
        min_near=cfg.min_near,
        background=cfg.background,
        bound=cfg.bound,
        perturb=False,
        training=False,
        return_feats=return_feats,
        return_mask=return_mask,
        sam_use_view_direction=cfg.sam_use_view_direction,
        max_ray_batch=cfg.max_ray_batch,
    )

    @jax.jit
    def eval_render(params, rays_o, rays_d, bg_color=1.0, cam_near_far=None):
        return nn.apply(
            lambda f, *a, **k: render_staged(f, *a, **k), model
        )(params, rays_o, rays_d, settings, bg_color=bg_color,
          cam_near_far=cam_near_far)

    return eval_render
