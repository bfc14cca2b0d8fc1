"""Stage-2 (SAM feature container), stage-3 (object field) and decode
drivers, operating on a stage-1 Trainer.

Reference call stacks: SURVEY.md §3.2-3.4.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.provider import Scene
from ..data.rays import full_frame_rays
from ..data.sampler import (
    fixed_fovy_intrinsics,
    sam_aug_intrinsics,
    sample_mask_batch,
)
from ..utils.cache import Cache
from ..utils.overlays import overlay_mask, overlay_point
from ..utils.points import PointPrompts, project_points_to_view
from .metrics import MeanIoUMeter
from .steps import make_mask_train_step, make_sam_distill_step, make_eval_render
from .trainer import Trainer, _save_image


def _stage_shard(trainer):
    """Data-parallel ray sharding for the stage-2/3 production loops —
    the same mesh layout as the stage-1 trainer (trainer.py full_step):
    rays sharded over the 'data' axis, params replicated, gradient
    all-reduce implicit in jit partitioning.  None on a single device."""
    if len(jax.devices()) <= 1:
        return None
    from ..parallel import make_mesh, data_sharding

    cfg = trainer.cfg
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer.log(f"[INFO] sharding stage rays over mesh {dict(mesh.shape)}")
    return data_sharding(mesh, cfg.mesh_axis_names[0])


# ---------------------------------------------------------------------------
# Stage 2 — SAM feature container
# ---------------------------------------------------------------------------

def store_sam_features(trainer: Trainer, scene: Scene, sam_predictor,
                       out_dir: Optional[str] = None):
    """Cache mode: render each training view, run the SAM encoder on the
    rendering, save the [64, 64, 256] features to sam_cache/{img}.npy
    (nerf/trainer.py:1069-1079; features stored per view name)."""
    out_dir = out_dir or os.path.join(trainer.workspace, "sam_cache")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(scene.poses.shape[0]):
        intr = (scene.intrinsics[i] if scene.intrinsics.ndim == 2
                else scene.intrinsics)
        out = trainer.render_view(scene.poses[i], intr, scene.H, scene.W)
        rgb = (np.clip(out["image"].reshape(scene.H, scene.W, 3), 0, 1)
               * 255).astype(np.uint8)
        feats = sam_predictor.set_image(rgb)  # [1, 64, 64, 256]
        stem = os.path.splitext(str(scene.img_names[i]))[0]
        np.save(os.path.join(out_dir, stem + ".npy"),
                np.asarray(feats[0]))
        trainer.log(f"[SAM-cache] {stem} saved")
    trainer.log(f"[INFO] stored SAM features to {out_dir}")


def evaluate_sam_features(trainer: Trainer, scene: Scene, sam_predictor,
                          max_views: Optional[int] = None,
                          save_dir: Optional[str] = None):
    """Stage-2 eval: rendered-feature MSE (nerf/trainer.py:648-691).

    Per view: render full-res RGB from the NeRF -> SAM-encode it for the
    ground-truth features; render the 64x64 feature map from the s_grid
    field; bilinear-resize the prediction to the gt grid and report MSE."""
    from .metrics import MSEMeter

    cfg = trainer.cfg
    if not hasattr(trainer, "_feat_render"):
        trainer._feat_render = make_eval_render(trainer.model, cfg,
                                                return_feats=True)
    meter = MSEMeter()
    n = scene.poses.shape[0] if max_views is None else min(
        max_views, scene.poses.shape[0])
    for i in range(n):
        intr = np.asarray(scene.intrinsics[i] if scene.intrinsics.ndim == 2
                          else scene.intrinsics, np.float32)
        H, W = scene.H, scene.W
        # stage-2 eval camera (nerf/provider.py:925-947): unless
        # --use_default_intrinsics, evaluate at a square online_resolution
        # camera — fixed fovy 60 by default, or the view's own focal
        # length when --use_default_focal_length
        if not cfg.use_default_intrinsics:
            H = W = cfg.online_resolution
            if cfg.use_default_focal_length:
                focal = float(intr[0])
            else:
                focal = H / (2.0 * np.tan(0.5 * np.deg2rad(60.0)))
            intr = np.array([focal, focal, H / 2, W / 2], np.float32)
        out = trainer.render_view(scene.poses[i], intr, H, W)
        rgb = (np.clip(out["image"].reshape(H, W, 3), 0, 1)
               * 255).astype(np.uint8)
        gt = np.asarray(sam_predictor.set_image(rgb)[0])  # [64, 64, 256]

        # aspect-preserving low-res feature rays (provider.py:1091-1106
        # renders 64x64 from a square online camera; with native W != H
        # intrinsics the valid SAM-feature region is only the top-left
        # fh x fw block of the padded encoder grid, so render and
        # compare exactly that block).  The grid is the PREDICTOR's
        # (img_size/16 = 64 for the standard 1024 model; tiny test SAMs
        # differ), not a constant.
        f_intr, fh, fw = lowres_feature_camera(
            intr, H, W, grid=sam_predictor.img_size // 16)
        ro, rd = full_frame_rays(jnp.asarray(scene.poses[i]),
                                 jnp.asarray(f_intr), fh, fw)
        fout = trainer._feat_render(trainer.state.params, ro, rd)
        pred = np.asarray(fout["samvit"]).reshape(fh, fw, -1)
        gt_valid = gt[:fh, :fw]
        meter.update(pred, gt_valid)
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            stem = os.path.splitext(str(scene.img_names[i]))[0]
            np.save(os.path.join(save_dir, f"{stem}_samvit.npy"), pred)
    trainer.log("[EVAL stage-2] " + meter.report())
    return meter.measure()


def make_render_and_encode(trainer: Trainer, sam, R: int,
                           img_size: int = 1024):
    """ONE jitted function: render a full R x R frame from the NeRF and run
    the SAM image encoder on it, entirely on-device.

    The reference bounces the rendered frame through host numpy/uint8
    between the two models (nerf/trainer.py:518-520 — SURVEY §7 'hard
    parts'); here the uint8 quantization is reproduced on-device
    (round(rgb*255)) and the resize/normalize/pad preprocessing happens in
    the same XLA program as the render."""
    import flax.linen as nn

    from ..render.renderer import RenderSettings, render_staged
    from ..sam.predictor import PIXEL_MEAN, PIXEL_STD

    cfg = trainer.cfg
    settings = RenderSettings(
        num_steps=tuple(cfg.num_steps), use_contract=cfg.contract,
        min_near=cfg.min_near, background=cfg.background, bound=cfg.bound,
        max_ray_batch=cfg.max_ray_batch,
    )
    mean = jnp.asarray(PIXEL_MEAN)
    std = jnp.asarray(PIXEL_STD)

    @jax.jit
    def render_and_encode(field_params, sam_params, rays_o, rays_d):
        out = nn.apply(
            lambda f, *a, **k: render_staged(f, *a, **k), trainer.model
        )(field_params, rays_o, rays_d, settings)
        rgb = jnp.clip(out["image"], 0.0, 1.0).reshape(R, R, 3)
        img8 = jnp.round(rgb * 255.0)  # reproduce the uint8 quantization
        img = jax.image.resize(img8, (img_size, img_size, 3), "bilinear")
        img = (img - mean) / std
        feats, interm = sam.encoder.apply(
            {"params": sam_params["encoder"]}, img[None], return_interm=True
        )
        return feats[0], interm[0][0] if interm else None

    return render_and_encode


def train_sam_distill(trainer: Trainer, scene: Scene, sam_predictor,
                      iters: Optional[int] = None,
                      on_device: bool = False):
    """Distill mode (nerf/trainer.py:507-555): per step, render a full
    online_resolution frame from a random train pose with random fovy,
    encode it with SAM (or reuse the cache ring), then regress the 64x64
    rendered feature map onto it."""
    cfg = trainer.cfg
    iters = iters or cfg.iters
    distill_step = make_sam_distill_step(
        trainer.model, cfg,
        frozen_backbone=getattr(trainer, "backbone_frozen", False),
        shard=_stage_shard(trainer))
    cache = Cache(cfg.cache_size) if cfg.cache_size > 0 else None
    R = cfg.online_resolution
    render_and_encode = None
    if on_device:
        render_and_encode = make_render_and_encode(
            trainer, sam_predictor.sam, R, sam_predictor.img_size)

    # host-side step counter: int(state.step) costs a ~27 ms device-tunnel
    # round-trip PER STEP, which dominates once the distill step itself is
    # ~7 ms (CP feature containers, BENCH distill_steps_per_sec)
    step = int(trainer.state.step)
    save_every = max(iters // max(cfg.save_cnt, 1), 1)
    while step < iters:
        trainer.key, k_view, k_fov, k_step = jax.random.split(trainer.key, 4)
        use_cache = (
            cache is not None and cache.full()
            and step % cfg.cache_interval != 0
        )
        if use_cache:
            batch = cache.get()
        else:
            vi = int(jax.random.randint(k_view, (), 0, scene.poses.shape[0]))
            pose = scene.poses[vi]
            intr = np.asarray(sam_aug_intrinsics(k_fov, R))
            # hi-res render -> SAM encoder ground truth
            ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(intr), R, R)
            if on_device:
                gt, _ = render_and_encode(
                    trainer.state.params, sam_predictor.sam.params, ro, rd)
            else:
                out = trainer.eval_render(trainer.state.params, ro, rd)
                rgb = (np.clip(np.asarray(out["image"]).reshape(R, R, 3), 0, 1)
                       * 255).astype(np.uint8)
                gt = sam_predictor.set_image(rgb)[0]  # [64, 64, 256]
            # low-res 64x64 feature rays (provider.py:1091-1106)
            scale = R / 64.0
            ro_lr, rd_lr = full_frame_rays(
                jnp.asarray(pose), jnp.asarray(intr) / scale, 64, 64
            )
            batch = {"rays_o_lr": ro_lr, "rays_d_lr": rd_lr,
                     "gt_samvit": gt}
            if cache is not None:
                cache.insert(batch)

        trainer.state, metrics = distill_step(trainer.state, batch, k_step)
        step += 1
        if step % 100 == 0 or step == iters:
            trainer.log(f"[SAM-distill {step}/{iters}] "
                        f"loss={float(metrics['loss']):.5f}")
        if step % save_every == 0:
            trainer.ckpt.save(step, trainer._state_tree())
    trainer.ckpt.save(step, trainer._state_tree())


# ---------------------------------------------------------------------------
# Stage 3 — object field
# ---------------------------------------------------------------------------

def train_mask(trainer: Trainer, scene: Scene, iters: Optional[int] = None):
    """Object-field training (nerf/trainer.py:401-505 + SURVEY §3.4)."""
    cfg = trainer.cfg
    iters = iters or cfg.iters
    assert scene.masks is not None, "stage-3 requires object masks"
    mask_step = make_mask_train_step(
        trainer.model, cfg,
        frozen_backbone=getattr(trainer, "backbone_frozen", False),
        shard=_stage_shard(trainer))
    S = cfg.error_map_size
    V = scene.poses.shape[0]
    error_map = jnp.ones((V, S * S), jnp.float32)  # init (provider.py:745-748)

    masks = jnp.asarray(scene.masks)
    poses = jnp.asarray(scene.poses)
    if cfg.use_default_intrinsics:
        intr = jnp.asarray(scene.intrinsics[0] if scene.intrinsics.ndim == 2
                           else scene.intrinsics)
        H, W = scene.H, scene.W
    else:
        # fixed fovy 60 at online_resolution (provider.py:950-956)
        H = W = cfg.online_resolution
        intr = fixed_fovy_intrinsics(cfg.online_resolution, 60.0)
        # masks must be resampled to that resolution
        if scene.masks.shape[1:] != (H, W):
            import cv2

            m = np.stack([
                cv2.resize(scene.masks[i].astype(np.float32), (W, H),
                           interpolation=cv2.INTER_NEAREST)
                for i in range(V)
            ]).astype(np.int32)
            masks = jnp.asarray(m)

    sampler = jax.jit(lambda key, em: sample_mask_batch(
        key, masks, poses, intr, em, cfg.num_rays, cfg.num_local_sample,
        cfg.local_sample_patch_size, H, W, S, use_error_map=cfg.error_map,
    ))

    # host-side counter (same ~27 ms/step sync rationale as the distill
    # loop above)
    step = int(trainer.state.step)
    while step < iters:
        trainer.key, kb, ks = jax.random.split(trainer.key, 3)
        batch = sampler(kb, error_map)
        batch["step"] = trainer.state.step
        trainer.state, metrics, error_map = mask_step(
            trainer.state, batch, ks, error_map
        )
        step += 1
        if cfg.error_map and cfg.ray_pair_rgb_iter > 0 and \
                step % cfg.ray_pair_rgb_iter == 0:
            error_map = update_error_map(trainer, scene, masks, poses, intr,
                                         H, W)
        if step % 20 == 0 or step == iters:
            # per-component logging: the total jumps when the ray-pair RGB
            # loss activates at ray_pair_rgb_iter (a new loss term, not a
            # divergence); ce alone is the comparable curve
            parts = "".join(
                f" {k}={float(metrics[k]):.4f}"
                for k in ("ce", "label_reg", "ray_pair") if k in metrics)
            trainer.log(f"[mask {step}/{iters}] "
                        f"loss={float(metrics['loss']):.4f}{parts} "
                        f"acc={float(metrics['acc']):.4f}")
    trainer.ckpt.save(int(trainer.state.step), trainer._state_tree())
    return error_map


def render_instance_mask(trainer: Trainer, pose, intrinsics, H, W,
                         params=None):
    """Render softmax mask probabilities for one view
    (nerf/trainer.py:1347-1369)."""
    if not hasattr(trainer, "_mask_render"):
        trainer._mask_render = make_eval_render(trainer.model, trainer.cfg,
                                                return_mask=True)
    ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(intrinsics), H, W)
    out = trainer._mask_render(
        params if params is not None else trainer.state.params, ro, rd
    )
    logits = np.asarray(out["instance_mask_logits"]).reshape(
        H, W, trainer.cfg.n_inst)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return probs, np.asarray(out["image"]).reshape(H, W, 3), \
        np.asarray(out["depth"]).reshape(H, W)


def downscale_intrinsics(intr, H: int, W: int, S: int):
    """Anisotropic downscale of [fx, fy, cx, cy] so an S x S render is
    pixel-aligned with cv2.resize(image, (S, S)) — correct for W != H
    (e.g. every Mip-NeRF 360 view): a world point projecting to (u, v) at
    full resolution projects to (u*S/W, v*S/H) in the small view.

    Deliberate divergence from the reference, whose collate_depth renders
    with a fixed fovy-60 square camera (nerf/provider.py:865-875) that is
    geometrically inconsistent with the resized gt masks it is compared
    against (nerf/trainer.py:1421)."""
    fx, fy, cx, cy = np.asarray(intr, np.float32)
    sx, sy = S / W, S / H
    return np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32)


def lowres_feature_camera(intr, H: int, W: int, grid: int = 64):
    """SAM-aligned low-res feature camera for a (possibly non-square)
    H x W view: returns (small_intr, h, w) where (h, w) preserves the
    aspect ratio with the LONG side equal to `grid` (SAM's
    resize-longest-side convention, sam predictor set_image), and the
    intrinsics are scaled per-axis so the h x w render covers exactly the
    full image.

    Feature pixel (u, v) of the render then corresponds to full-res pixel
    (u * W/w, v * H/h) ~= (u * max(H,W)/grid, ...) — the same layout as a
    SAM encoder feature map after its bottom/right zero-padding is
    stripped, so SamPredictor.set_features (which resizes long side to
    `grid`, a no-op here, and re-pads) aligns it exactly with cached
    encoder features.  Rendering a square grid x grid frame instead (the
    pre-round-5 behavior) put *rendered scene content* where SAM has
    padding and mis-scaled the short axis for every W != H view
    (VERDICT r4 #4; reference sidesteps this by always using square
    online cameras, provider.py:925-956)."""
    M = max(H, W)
    h = int(H * grid / M + 0.5)
    w = int(W * grid / M + 0.5)
    fx, fy, cx, cy = np.asarray(intr, np.float32)
    sx, sy = w / W, h / H
    return (np.array([fx * sx, fy * sy, cx * sx, cy * sy], np.float32),
            h, w)


def update_error_map(trainer: Trainer, scene: Scene, masks, poses, intr,
                     H, W):
    """Re-render all views at error_map_size and rebuild the error map
    (nerf/trainer.py:1406-1435)."""
    cfg = trainer.cfg
    S = cfg.error_map_size
    V = poses.shape[0]
    import cv2

    small_intr = downscale_intrinsics(intr, H, W, S)
    err_rows = []
    masks_np = np.asarray(masks)
    for i in range(V):
        probs, _, _ = render_instance_mask(trainer, poses[i], small_intr, S, S)
        gt_small = cv2.resize(masks_np[i].astype(np.float32), (S, S),
                              interpolation=cv2.INTER_LINEAR)
        gt_small = np.rint(np.clip(gt_small, 0, cfg.n_inst - 1)).astype(np.int64)
        onehot = np.eye(cfg.n_inst, dtype=np.float32)[gt_small]
        cos = (probs * onehot).sum(-1) / np.maximum(
            np.linalg.norm(probs, axis=-1) * np.linalg.norm(onehot, axis=-1),
            1e-8,
        )
        err = np.exp(-cfg.ray_pair_rgb_exp_weight * cos - cfg.epsilon)
        err_rows.append(err.reshape(-1))
    return jnp.asarray(np.stack(err_rows))


def evaluate_masks(trainer: Trainer, scene: Scene, save_dir=None,
                   render_mask_type: str = "heatmap"):
    """mIoU eval of the object field against GT masks (test_obj_nerf)."""
    meter = MeanIoUMeter()
    H, W = scene.H, scene.W
    for i in range(scene.poses.shape[0]):
        intr = (scene.intrinsics[i] if scene.intrinsics.ndim == 2
                else scene.intrinsics)
        probs, rgb, _ = render_instance_mask(trainer, scene.poses[i], intr,
                                             H, W)
        pred = probs.argmax(-1)
        if scene.masks is not None:
            meter.update(pred, scene.masks[i])
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            stem = os.path.splitext(str(scene.img_names[i]))[0]
            np.save(os.path.join(save_dir, f"{stem}_mask.npy"), probs)
            if render_mask_type == "mask":
                vis = np.repeat(pred[..., None].astype(np.float32), 3, -1)
            elif render_mask_type == "composition":
                vis = np.where((pred > 0)[..., None], rgb, 1.0)
            else:  # heatmap
                p1 = probs[..., min(trainer.cfg.render_mask_instance_id,
                                    probs.shape[-1] - 1)]
                vis = overlay_mask(rgb, p1 > 0.5)
            _save_image(os.path.join(save_dir, f"{stem}_mask_vis.png"), vis)
    trainer.log("[EVAL] " + meter.report())
    return meter.measure()


# ---------------------------------------------------------------------------
# Decode — 3-D point prompts -> per-view masks
# ---------------------------------------------------------------------------

def decode(trainer: Trainer, scene: Scene, sam_predictor,
           prompts: PointPrompts, out_dir: Optional[str] = None,
           feature_container: str = "cache", depth_tol: float = 0.05):
    """Per-view mask decode (nerf/trainer.py:895-994, 1746-1775):
    render RGB+depth, obtain features (cache npy or distilled render),
    project 3-D prompts with occlusion gating, run the SAM decoder, save
    {img}_rgb.png / _depth.npy / _obj_mask.npy and valid_dict.json."""
    import json

    cfg = trainer.cfg
    out_dir = out_dir or os.path.join(trainer.workspace, "object_masks")
    os.makedirs(out_dir, exist_ok=True)
    valid_dict = {}
    H, W = scene.H, scene.W

    feats_render = None
    if feature_container == "distill":
        feats_render = make_eval_render(trainer.model, cfg, return_feats=True)

    for i in range(scene.poses.shape[0]):
        stem = os.path.splitext(str(scene.img_names[i]))[0]
        intr = (scene.intrinsics[i] if scene.intrinsics.ndim == 2
                else scene.intrinsics)
        out = trainer.render_view(scene.poses[i], intr, H, W)
        rgb = out["image"].reshape(H, W, 3)
        depth = out["depth"].reshape(H, W)

        if feature_container == "cache":
            fpath = os.path.join(trainer.workspace, "sam_cache", stem + ".npy")
            feats = np.load(fpath)  # [64, 64, 256] (or [256, h, w] legacy)
            if feats.ndim == 3 and feats.shape[0] == 256:
                feats = feats.transpose(1, 2, 0)
        else:
            # aspect-preserving low-res feature render; set_features
            # zero-pads the short side to SAM's square grid
            f_intr, fh, fw = lowres_feature_camera(intr, H, W)
            ro, rd = full_frame_rays(jnp.asarray(scene.poses[i]),
                                     jnp.asarray(f_intr), fh, fw)
            fo = feats_render(trainer.state.params, ro, rd)
            feats = np.asarray(fo["samvit"]).reshape(fh, fw, -1)

        gate_info: dict = {}
        coords, labels, crucial, is_valid = project_points_to_view(
            prompts, scene.poses[i], np.asarray(intr), H, W,
            pred_depth=depth, depth_tol=depth_tol, info=gate_info,
        )
        if coords is not None:
            sam_predictor.set_features(feats, original_size=(H, W))
            input_coords = sam_predictor.transform_coords(coords)
            masks, scores, _ = sam_predictor.predict(
                point_coords=input_coords, point_labels=labels,
                multimask_output=True,
            )
            best = int(np.argmax(scores))
            pred_mask = masks[best]
            vis = overlay_mask(rgb, pred_mask)
            vis = overlay_point(vis, coords, inputs_point_labels=labels)
        else:
            pred_mask = np.zeros((H, W), bool)
            vis = rgb
            is_valid = False

        _save_image(os.path.join(out_dir, f"{stem}_rgb.png"), vis)
        np.save(os.path.join(out_dir, f"{stem}_depth.npy"), depth)
        # reference shape [1, H, W] and scalar int validity
        # (nerf/trainer.py:1770-1772)
        np.save(os.path.join(out_dir, f"{stem}_obj_mask.npy"),
                pred_mask.astype(np.uint8)[None])
        valid_dict[stem] = int(bool(is_valid))
        err = gate_info.get("depth_err")
        err_s = (f" gate|z-depth| min={err.min():.3f} max={err.max():.3f}"
                 f" tol={depth_tol}" if err is not None and err.size else "")
        trainer.log(f"[decode] {stem} valid={is_valid}{err_s}")

    with open(os.path.join(out_dir, "valid_dict.json"), "w") as f:
        json.dump(valid_dict, f, indent=2)
    trainer.log(f"[INFO] decode outputs saved to {out_dir}")
    return out_dir
