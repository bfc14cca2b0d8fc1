"""Proposal-network volume renderer — one fused, fixed-shape pass.

Reference semantics: nerf/renderer.py:221-502 (`NeRFRenderer.run`).  The hot
loop has *fixed per-ray sample counts* (default [128, 64, 32]), so the whole
renderer traces to static shapes under jit/pjit — ideal on TPU, no
compaction tricks needed (SURVEY.md intro).

Differences from the reference by design (TPU-first):
  - `update_proposal` is a traced scalar; gradient gating uses
    where(flag, x, stop_gradient(x)) instead of torch.set_grad_enabled so
    one compiled step serves both cadences (nerf/trainer.py:372-373).
  - staged inference is lax.map over fixed-size ray chunks instead of a
    Python loop (nerf/renderer.py:189-219).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import (
    compute_weights,
    contract,
    distort_loss,
    near_far_from_aabb,
    proposal_loss,
    sample_pdf,
    sh_encode,
    spacing_fn,
    spacing_fn_inv,
)
from ..models.fields import SANeRFField, GEOM_FEAT_DIM, SH_DEGREE, SH_DIM


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (trace-time) rendering options."""
    num_steps: Tuple[int, ...] = (128, 64, 32)
    use_contract: bool = True
    min_near: float = 0.2
    background: str = "last_sample"  # white | random | last_sample
    bound: float = 128.0  # world-space aabb half-edge (aabb_train)
    perturb: bool = False
    training: bool = False
    return_feats: bool = False
    return_mask: bool = False
    sam_use_view_direction: bool = False
    compute_losses: bool = False  # proposal + distortion losses
    max_ray_batch: int = 16384
    # stage-2/3 contract: the NeRF backbone is frozen by the optimizer
    # mask (reference main.py:249-256), so the side-output paths
    # (return_feats / return_mask) may run the backbone render through the
    # non-differentiable inference megakernels under stop_gradient —
    # only the trainable feature/mask branch stays on the backward graph
    frozen_backbone: bool = False


def render_rays(
    field: SANeRFField,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    bg_color=1.0,
    cam_near_far: Optional[jnp.ndarray] = None,
    update_proposal=True,
    aabb: Optional[jnp.ndarray] = None,
):
    """Render a batch of rays. `field` must be a bound module (use
    nn.apply(render_rays, model) or call inside another module method).

    rays_o, rays_d: [N, 3] (rays_d unnormalized -> depth is z-distance).
    Returns a dict of per-ray outputs (reference keys: image, depth,
    weights_sum, weights, num_points, proposal_loss, distort_loss, samvit,
    instance_mask_logits).
    """
    N = rays_o.shape[0]
    n_levels = len(settings.num_steps)

    if aabb is None:
        b = settings.bound
        aabb = jnp.array([-b, -b, -b, b, b, b], dtype=jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, :1])
        fars = jnp.minimum(fars, cam_near_far[:, 1:2])

    s_nears = spacing_fn(nears)  # [N, 1]
    s_fars = spacing_fn(fars)

    # A static (python bool) update_proposal lets XLA drop the proposal
    # backward kernels and the interlevel loss entirely — train steps
    # lax.cond between the two compiled variants on the reference cadence
    # (step <= 3000 or step % 5 == 0, nerf/trainer.py:372-373).  A traced
    # value falls back to where-gating (forward unchanged, grads zeroed).
    static_upd = isinstance(update_proposal, bool)
    if static_upd:
        def grad_gate(x):
            return x if update_proposal else jax.lax.stop_gradient(x)
    else:
        upd = jnp.asarray(update_proposal)

        def grad_gate(x):
            # gradient flows iff upd is True; forward value unchanged
            return jnp.where(upd, x, jax.lax.stop_gradient(x))

    all_bins = []
    all_weights = []
    results = {}

    bins = None
    weights = None
    rays_t = None
    colors = None
    geo_feat = None
    xyzs_final = None

    keys = (
        list(jax.random.split(key, n_levels)) if key is not None else [None] * n_levels
    )

    # inference megakernel: the whole final level (geometry + trunk MLP +
    # compositing) as ONE Pallas kernel when the field supports it and no
    # per-sample side outputs are needed (ops/render_level_pallas.py)
    from ..ops.fused_mlp import PALLAS_ENABLED

    side_outputs = settings.return_feats or settings.return_mask
    fused_backbone_ok = PALLAS_ENABLED and getattr(
        field, "supports_fused_final", False)
    fused_capable = fused_backbone_ok and not side_outputs
    fused_final = fused_capable and not settings.training
    # training megakernels: custom-VJP level kernels (round 2) — same
    # fusion, gradients for the MLP weights computed by Pallas backward
    # kernels (ops/render_level_pallas.py)
    fused_train = fused_capable and settings.training
    # side-output paths with a frozen backbone (stage-2 distill, stage-3
    # mask, and all side-output EVAL renders): backbone through the
    # inference megakernels under stop_gradient; per-sample weights and
    # (for the mask branch) trunk features come back from VMEM, and only
    # the s_grid/m_grid + samvit/mask-MLP branch is differentiable
    fused_frozen = (
        fused_backbone_ok and side_outputs and not settings.compute_losses
        and (not settings.training or settings.frozen_backbone)
    )
    fused_out = None

    bins_folded = None
    for level, T in enumerate(settings.num_steps):
        if level == 0:
            bins = jnp.linspace(0.0, 1.0, T + 1, dtype=jnp.float32)
            bins = jnp.broadcast_to(bins, (N, T + 1))
            if settings.perturb and keys[0] is not None:
                bins = bins + (
                    jax.random.uniform(keys[0], (N, T + 1)) - 0.5
                ) / T
                bins = jnp.clip(bins, 0.0, 1.0)
        elif bins_folded is not None:
            # bins already produced in-kernel by the fused prop+resample
            bins, bins_folded = bins_folded, None
        else:
            pk = keys[level] if settings.perturb else None
            bins = jax.lax.stop_gradient(
                sample_pdf(bins, weights, T + 1, key=pk)
            )

        real_bins = spacing_fn_inv(s_nears * (1.0 - bins) + s_fars * bins)  # [N, T+1]
        opaque = settings.background == "last_sample"
        if fused_final and level == n_levels - 1:
            fused_out = field.fused_final_render(
                rays_o, rays_d, real_bins, opaque_last=opaque,
            )
            break
        if fused_frozen and level == n_levels - 1:
            f_img_k, depth_k, wsum_k, weights, geo_feat = \
                field.fused_final_render_frozen(
                    rays_o, rays_d, real_bins, opaque_last=opaque,
                    need_geo=settings.return_mask)
            fused_out = (f_img_k, depth_k, wsum_k)
            rays_t = (real_bins[..., 1:] + real_bins[..., :-1]) / 2.0
            xyzs_final = (rays_o[:, None, :]
                          + rays_d[:, None, :] * rays_t[..., None])
            if settings.use_contract:
                xyzs_final = contract(xyzs_final)
            xyzs_final = jax.lax.stop_gradient(xyzs_final)
            break
        if (fused_final or fused_frozen) and level < n_levels - 1:
            # proposal megakernel WITH folded inverse-CDF resampling: the
            # next level's s-space bins come straight out of VMEM; the
            # per-sample weights never reach HBM (ops/render_level_pallas.
            # fused_prop_level_sample).  Same stratified-midpoint queries
            # as ops/ray.py sample_pdf.
            Tn = settings.num_steps[level + 1] + 1
            u = jnp.linspace(0.5 / Tn, 1.0 - 0.5 / Tn, Tn,
                             dtype=jnp.float32)
            u = jnp.broadcast_to(u, (N, Tn))
            if settings.perturb and keys[level + 1] is not None:
                u = u + (
                    jax.random.uniform(keys[level + 1], (N, Tn)) - 0.5
                ) / Tn
            bins_folded = field.fused_prop_next_bins(
                rays_o, rays_d, real_bins, bins, u, proposal=level,
                opaque_last=opaque, frozen=fused_frozen,
            )
            continue
        if fused_train and level == n_levels - 1:
            f_image_k, depth_k, wsum_k, weights = \
                field.fused_final_render_train(
                    rays_o, rays_d, real_bins, opaque_last=opaque)
            fused_out = (f_image_k, depth_k, wsum_k)
            all_bins.append(bins)
            all_weights.append(weights)
            break
        if fused_train and level < n_levels - 1:
            # training twin of the folded prop level: weights come back
            # for the interlevel proposal loss; the next level's s-space
            # bins come straight out of VMEM (detached, like the
            # reference's sample_pdf .detach())
            Tn = settings.num_steps[level + 1] + 1
            u = jnp.linspace(0.5 / Tn, 1.0 - 0.5 / Tn, Tn,
                             dtype=jnp.float32)
            u = jnp.broadcast_to(u, (N, Tn))
            if settings.perturb and keys[level + 1] is not None:
                u = u + (
                    jax.random.uniform(keys[level + 1], (N, Tn)) - 0.5
                ) / Tn
            weights, nb = field.fused_prop_weights_train_sample(
                rays_o, rays_d, real_bins, bins, u, proposal=level,
                opaque_last=opaque)
            weights = grad_gate(weights)
            bins_folded = jax.lax.stop_gradient(nb)
            all_bins.append(bins)
            all_weights.append(weights)
            continue
        rays_t = (real_bins[..., 1:] + real_bins[..., :-1]) / 2.0  # [N, T]
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * rays_t[..., None]  # [N,T,3]
        if settings.use_contract:
            xyzs = contract(xyzs)

        if level != n_levels - 1:
            sigmas = grad_gate(field.density(xyzs, proposal=level))  # [N, T]
        else:
            dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            sigmas, geo_feat, colors, _ = field.forward_color(xyzs, dirs)
            xyzs_final = xyzs

        deltas = real_bins[..., 1:] - real_bins[..., :-1]  # [N, T]
        weights, _ = compute_weights(
            deltas, sigmas, opaque_last=(settings.background == "last_sample")
        )

        if settings.training:
            all_bins.append(bins)
            all_weights.append(weights)

    # composite
    if fused_out is not None:
        f_image, depth, weights_sum = fused_out
    else:
        weights_sum = jnp.sum(weights, axis=-1)  # [N]
        depth = jnp.sum(weights * rays_t, axis=-1)  # [N]
        f_image = jnp.sum(weights[..., None] * colors, axis=-2)  # [N, 31]
    image = jax.nn.sigmoid(field.apply_view_mlp(f_image))  # [N, 3]

    if settings.training:
        results["num_points"] = N * settings.num_steps[-1]
        results["weights"] = weights
        if settings.compute_losses:
            # gated by update_proposal like the reference's conditional add
            if static_upd:
                results["proposal_loss"] = (
                    proposal_loss(all_bins, all_weights) if update_proposal
                    else jnp.float32(0.0))
            else:
                results["proposal_loss"] = (
                    proposal_loss(all_bins, all_weights)
                    * upd.astype(jnp.float32)
                )
            results["distort_loss"] = distort_loss(bins, weights)

    image = image + (1.0 - weights_sum)[..., None] * bg_color

    results["weights_sum"] = weights_sum
    results["depth"] = depth
    results["image"] = image

    if settings.return_feats:
        # SAM feature branch (nerf/renderer.py:359-374)
        features = field.sam_features(xyzs_final)  # [N, T, 128]
        f_sam = jnp.sum(weights[..., None] * features, axis=-2)  # [N, 128]
        if settings.sam_use_view_direction:
            f = jnp.concatenate(
                [f_sam, f_image, image, depth[..., None]], axis=-1
            )  # [N, 128+31+3+1]
        else:
            if geo_feat is None:
                # fused frozen path: the kernel already composited the
                # trunk features — f_image[:, :15] IS sum_s w_s*geo_feat
                geo_sum = f_image[..., :GEOM_FEAT_DIM]
            else:
                geo_sum = jnp.sum(weights[..., None] * geo_feat, axis=-2)
            f = jnp.concatenate([f_sam, geo_sum, image, depth[..., None]], axis=-1)
        results["samvit"] = field.apply_samvit_mlp(f)  # [N, 256]

    if settings.return_mask:
        # object-field branch (nerf/renderer.py:304-305, 376-385): mask MLP on
        # per-sample features, composited with DETACHED weights.
        masks = field.mask_features(xyzs_final)  # [N, T, m_dim]
        if field.mask_mlp_type == "default":
            m = jnp.concatenate(
                [masks, jax.lax.stop_gradient(geo_feat)], axis=-1
            )
        else:
            if colors is None:
                # fused frozen path: rebuild per-sample colors
                # [geo_feat | sh] (sh is per-ray constant)
                dn = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
                sh = sh_encode(dn, SH_DEGREE)  # [N, 16]
                colors = jnp.concatenate(
                    [geo_feat,
                     jnp.broadcast_to(sh[:, None, :],
                                      (*geo_feat.shape[:2], sh.shape[-1]))],
                    axis=-1)
            m = jnp.concatenate(
                [masks, jax.lax.stop_gradient(colors)], axis=-1
            )
        point_masks = field.apply_mask_mlp(m)  # [N, T, n_inst]
        results["instance_mask_logits"] = jnp.sum(
            jax.lax.stop_gradient(weights)[..., None] * point_masks, axis=-2
        )

    return results


def render_staged(
    field: SANeRFField,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    bg_color=1.0,
    cam_near_far: Optional[jnp.ndarray] = None,
    aabb: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
):
    """Chunked full-frame inference (reference nerf/renderer.py:185-219).

    Pads the ray count to a multiple of max_ray_batch and lax.map's
    render_rays over fixed-size chunks -> single compilation, bounded memory.
    `key` enables perturbed sampling per chunk (GUI SPP accumulation,
    nerf/gui.py:145-186); None keeps the deterministic eval path.
    """
    N = rays_o.shape[0]
    chunk = min(settings.max_ray_batch, N) if N > 0 else settings.max_ray_batch
    pad = (-N) % chunk
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3), rays_o.dtype)], axis=0)
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)], axis=0)
    if cam_near_far is not None and cam_near_far.shape[0] == N:
        cnf = jnp.concatenate(
            [cam_near_far, jnp.ones((pad, 2), cam_near_far.dtype)], axis=0
        ).reshape(-1, chunk, 2)
    else:
        cnf = None

    ro = ro.reshape(-1, chunk, 3)
    rd = rd.reshape(-1, chunk, 3)
    idx = jnp.arange(ro.shape[0], dtype=jnp.int32)

    def body(args):
        if cnf is not None:
            i, o, d, nf = args
        else:
            i, o, d = args
            nf = cam_near_far  # None or [1, 2] broadcast
        return render_rays(
            field, o, d, settings,
            key=None if key is None else jax.random.fold_in(key, i),
            bg_color=bg_color,
            cam_near_far=nf, update_proposal=False, aabb=aabb,
        )

    args = (idx, ro, rd, cnf) if cnf is not None else (idx, ro, rd)
    out = jax.lax.map(body, args)
    return {k: v.reshape(-1, *v.shape[2:])[:N] for k, v in out.items()}
