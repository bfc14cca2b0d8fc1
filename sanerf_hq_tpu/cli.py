"""CLI preserving the reference surface: `python main.py <path> [flags]`
(reference: main.py:16-327).  Parses the same flag set into a frozen
Config, applies the same post-parse hard overrides, builds the model,
dataset and trainer, and dispatches to train / test / decode per stage.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np

from .config import Config

# Honor user platform forcing (JAX_PLATFORM_NAME / JAX_PLATFORMS) even
# though this image's TPU plugin imports jax at interpreter start
# (sitecustomize), making env vars alone too late: the platform list must
# be re-forced post-import, before backend init.  Subtlety: the plugin's
# sitecustomize *injects* JAX_PLATFORMS=<tpu-platform> whenever the var is
# unset, so its mere presence is NOT user intent — naively honoring it
# turned a user's JAX_PLATFORM_NAME=cpu into a force of the injected TPU
# value, and the run wedged in the plugin's connect-retry loop at orbax's
# jax.default_backend() probe whenever the tunnel was down.
# JAX_PLATFORM_NAME is never injected (always user intent); JAX_PLATFORMS
# counts only when it does not name the plugin's own platform (a user's
# JAX_PLATFORMS=cpu also holds natively, the update is reinforcement).
_plat = os.environ.get("JAX_PLATFORM_NAME")
if not _plat:
    _envp = os.environ.get("JAX_PLATFORMS", "")
    _plat = _envp if _envp and "axon" not in _envp.lower() else None
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat.lower()
    import jax

    jax.config.update("jax_platforms", _plat.lower())


from .utils.compile_cache import enable_compile_cache as _enable_compile_cache

_enable_compile_cache()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str)
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--fp16", action="store_true")

    # SAM feature options
    p.add_argument("--with_sam", action="store_true")
    p.add_argument("--sam_type", type=str, default="sam",
                   choices=["sam", "sam_hq"])
    p.add_argument("--sam_model_type", type=str, default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b"],
                   help="encoder size (reference pins vit_h, main.py:258)")
    p.add_argument("--init_ckpt", type=str, default="")
    p.add_argument("--sam_ckpt", type=str,
                   default="./pretrained/sam_vit_h_4b8939.pth")
    p.add_argument("--online_resolution", type=int, default=512)
    p.add_argument("--sam_use_view_direction", action="store_true")
    p.add_argument("--sum_after_mlp", action="store_true",
                   help="surface parity only: dead in the reference too "
                        "(parsed at main.py:36; only read inside the commented-out mesh branch, nerf/renderer.py:472)")
    p.add_argument("--cache_size", type=int, default=256)
    p.add_argument("--cache_interval", type=int, default=4)
    p.add_argument("--feature_container", type=str, default="cache",
                   choices=["cache", "distill"])

    # testing
    p.add_argument("--save_cnt", type=int, default=20)
    p.add_argument("--eval_cnt", type=int, default=5)
    p.add_argument("--test", action="store_true")
    p.add_argument("--camera_traj", type=str, default="interp")

    # dataset
    p.add_argument("--train_split", type=str, default="train",
                   choices=["train", "trainval", "all"])
    p.add_argument("--test_split", type=str, default="val",
                   choices=["train", "val", "test"])
    p.add_argument("--preload", action="store_true")
    p.add_argument("--random_image_batch", action="store_true")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--bound", type=float, default=2)
    p.add_argument("--scale", type=float, default=-1)
    p.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    p.add_argument("--enable_cam_near_far", action="store_true")
    p.add_argument("--enable_cam_center", action="store_true")
    p.add_argument("--min_near", type=float, default=0.2)
    p.add_argument("--T_thresh", type=float, default=1e-4,
                   help="surface parity only: dead in the reference too "
                        "(only read by the commented-out mesh branch, "
                        "nerf/renderer.py:386-498)")

    # training
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--num_steps", type=int, nargs="*", default=[128, 64, 32])
    p.add_argument("--contract", action="store_true")
    p.add_argument("--background", type=str, default="last_sample",
                   choices=["white", "random", "last_sample"])
    p.add_argument("--max_ray_batch", type=int, default=4096 * 4)
    p.add_argument("--density_thresh", type=float, default=10,
                   help="surface parity only: dead in the reference too "
                        "(a torch-ngp occupancy-grid leftover; no "
                        "raymarching extension exists, SURVEY.md intro)")
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--adaptive_num_rays", action="store_true")
    p.add_argument("--num_points", type=int, default=2 ** 18)

    # regularizers
    p.add_argument("--lambda_entropy", type=float, default=0)
    p.add_argument("--lambda_tv", type=float, default=0)
    p.add_argument("--lambda_wd", type=float, default=0)
    p.add_argument("--lambda_proposal", type=float, default=1)
    p.add_argument("--lambda_distort", type=float, default=0.02)

    # mask stage
    p.add_argument("--with_mask", action="store_true")
    p.add_argument("--mask_mlp_type", type=str, default="default",
                   choices=["default", "lightweight_mask"])
    p.add_argument("--mask_root", type=str, default=None)
    p.add_argument("--test_view_path", type=str, default=None)
    p.add_argument("--n_inst", type=int, default=2)
    p.add_argument("--label_regularization_weight", type=float, default=0.0)
    p.add_argument("--ray_jittering", action="store_true",
                   help="surface parity only: dead in the reference too "
                        "(parsed at main.py:128, never read)")

    # ray-pair RGB loss
    p.add_argument("--ray_pair_rgb_loss_weight", type=float, default=0)
    p.add_argument("--ray_pair_rgb_threshold", type=float, default=0.3)
    p.add_argument("--epsilon", type=float, default=1e-6)
    p.add_argument("--ray_pair_rgb_exp_weight", type=float, default=10)
    p.add_argument("--ray_pair_rgb_num_sample", type=int, default=1)
    p.add_argument("--ray_pair_rgb_iter", type=int, default=-1)
    p.add_argument("--ray_pair_rgb_use_pred_logistics", action="store_true")
    p.add_argument("--mixed_sampling", action="store_true")
    p.add_argument("--local_sample_patch_size", type=int, default=16)
    p.add_argument("--num_local_sample", type=int, default=2)
    p.add_argument("--error_map", action="store_true")
    p.add_argument("--error_map_size", type=int, default=128)
    p.add_argument("--return_extra", action="store_true")

    # decode / eval
    p.add_argument("--decode", action="store_true")
    p.add_argument("--point_file", default=None, type=str)
    p.add_argument("--use_point", action="store_true")
    p.add_argument("--use_default_intrinsics", action="store_true")
    p.add_argument("--use_default_focal_length", action="store_true")
    p.add_argument("--use_gt_focal_length", action="store_true",
                   help="surface parity only: dead in the reference too "
                        "(parsed at main.py:172, never read)")
    p.add_argument("--val_type", type=str, default="default",
                   choices=["default", "val_all", "val_split"])
    p.add_argument("--render_mesh", action="store_true")
    p.add_argument("--render_mask_type", type=str, default="heatmap",
                   choices=["mask", "composition", "heatmap"])
    p.add_argument("--render_mask_instance_id", type=int, default=0)
    p.add_argument("--val_save_root", type=str, default=None)
    p.add_argument("--auto_seg", action="store_true")

    # GUI
    p.add_argument("--vis_pose", action="store_true")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--radius", type=float, default=0.5)
    p.add_argument("--fovy", type=float, default=60)
    p.add_argument("--max_spp", type=int, default=1)

    # dataset type
    p.add_argument("--data_type", type=str, default="mip",
                   choices=["mip", "lerf", "llff", "3dfront", "ctr", "pano",
                            "others"])
    p.add_argument("--scene_name", type=str, default="garden")
    p.add_argument("--object_name", type=str, default="table_whole")
    p.add_argument("--gui_mouse_right_drag", action="store_true")
    p.add_argument("--trajectory_root", type=str, default=None)
    p.add_argument("--render_trajectory", action="store_true")
    p.add_argument("--circle", action="store_true")

    # TPU-native additions
    p.add_argument("--field_type", type=str, default="hashgrid",
                   choices=["hashgrid", "hashgrid_packed", "mlp"])
    p.add_argument("--lambda_distort_warmup", type=int, default=1000,
                   help="ramp lambda_distort in over [w, 2w] steps; 0 = "
                        "reference behavior (active from step 0)")
    p.add_argument("--cp_rank", type=int, default=64,
                   help="CP-factorized spatial feature rank for the mlp "
                        "flagship field (0 = pure freq-MLP)")
    p.add_argument("--cp_res", type=int, default=256)
    p.add_argument("--feat_rep", type=str, default="cp",
                   choices=["cp", "hashgrid"],
                   help="s_grid/m_grid representation for the mlp flagship: "
                        "CP volumes (matmul-bound, TPU-native) or the "
                        "reference-like hash volume")
    p.add_argument("--feat_rank", type=int, default=128)
    p.add_argument("--feat_res", type=int, default=256)
    p.add_argument("--density_bias", type=float, default=0.0,
                   help="initial density shift: sigma = exp(raw + bias) "
                        "(mlp field)")
    p.add_argument("--on_device_sam", action="store_true", default=None,
                   dest="on_device_sam",
                   help="fuse render->SAM-encode into one jitted program "
                        "during distillation (no host round-trip).  Default: "
                        "auto — ON when running on TPU, OFF on CPU (where "
                        "the fused ViT encode compile dominates)")
    p.add_argument("--no_on_device_sam", action="store_false",
                   dest="on_device_sam", help="force the host round-trip "
                   "distill path (reference nerf/trainer.py:518-520)")
    return p


def config_from_args(args) -> Config:
    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in cfg_fields}
    kw["num_steps"] = tuple(args.num_steps)
    kw["offset"] = tuple(args.offset)
    cfg = Config(**kw)
    # post-parse hard overrides (main.py:217-222)
    return cfg.replace(fp16=False, bound=128.0, preload=True, contract=True,
                       adaptive_num_rays=True)


def load_init_params(path: str):
    """Resolve --init_ckpt (cross-stage hand-off, main.py:249-256).

    Accepts a workspace dir (uses <ws>/checkpoints/latest), a checkpoints
    dir, or a direct orbax checkpoint path."""
    from .train.checkpoints import CheckpointManager

    candidates = []
    if os.path.isdir(os.path.join(path, "checkpoints")):
        candidates.append(("ws", path))
    if os.path.basename(path.rstrip("/")) == "checkpoints":
        candidates.append(("ws", os.path.dirname(path.rstrip("/"))))
    for kind, ws in candidates:
        restored = CheckpointManager(ws).restore("latest")
        if restored is not None:
            return restored.get("params", restored)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(path)
    return restored.get("params", restored) if isinstance(restored, dict) \
        else restored


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.render_mesh:
        # Parity flag only: the reference's mesh-render branch is dead code
        # (entire implementation commented out at nerf/renderer.py:257,
        # :270-500; enabling it there leaves bins=None and crashes).  Fail
        # fast with an explanation rather than replicate the breakage.
        raise SystemExit(
            "error: --render_mesh is not supported (the reference's mesh "
            "branch is commented out / non-functional; see SURVEY.md §2.5)")
    cfg = config_from_args(args)

    # fail fast on inconsistent flag combos (before any model/SAM build)
    if cfg.decode and cfg.use_point and not cfg.point_file:
        raise SystemExit(
            "error: --decode --use_point requires --point_file "
            "(3-D prompt json, see example_points.json)")
    if cfg.decode and not cfg.with_sam:
        raise SystemExit("error: --decode requires --with_sam")
    if cfg.with_mask and not cfg.mask_root and not cfg.test:
        raise SystemExit(
            "error: --with_mask training requires --mask_root "
            "(decode outputs directory)")

    from .data.provider import load_scene, split_indices, load_object_masks
    from .models import make_field
    from .train.trainer import Trainer
    from .train import stages, metrics as M

    model = make_field(
        cfg.field_type,
        grid_bound=cfg.grid_bound,
        with_sam=cfg.with_sam,
        with_mask=cfg.with_mask,
        mask_mlp_type=cfg.mask_mlp_type,
        n_inst=cfg.n_inst,
        sam_use_view_direction=cfg.sam_use_view_direction,
        cp_rank=cfg.cp_rank,
        cp_res=cfg.cp_res,
        density_bias=cfg.density_bias,
        feat_rep=cfg.feat_rep,
        feat_rank=cfg.feat_rank,
        feat_res=cfg.feat_res,
    )

    scene = load_scene(
        cfg.path, cfg.data_type, cfg.downscale, cfg.scale, cfg.offset,
        cfg.enable_cam_center, cfg.bound,
    )

    if cfg.vis_pose:
        # pose debugging dump (reference: provider.py:761 -> an interactive
        # trimesh window; headless here -> PLY + PNG in the workspace)
        from .utils.vis_pose import visualize_poses

        os.makedirs(cfg.workspace, exist_ok=True)
        ply = visualize_poses(
            scene.poses, bound=cfg.bound, points=scene.pts3d,
            out_path=os.path.join(cfg.workspace, "poses.ply"))
        print(f"[INFO] pose visualization written to {ply}(.png)")

    test_view_names = None
    if cfg.test_view_path:
        import json

        with open(cfg.test_view_path) as f:
            test_view_names = json.load(f)
        if isinstance(test_view_names, dict):
            test_view_names = test_view_names.get(
                "test_view_list", test_view_names.get("test_views", []))

    def subset(scene, idx):
        import copy

        s = copy.copy(scene)
        s.images = scene.images[idx] if scene.images is not None else None
        s.poses = scene.poses[idx]
        s.intrinsics = (scene.intrinsics[idx]
                        if scene.intrinsics.ndim == 2 else scene.intrinsics)
        s.img_names = scene.img_names[idx]
        if scene.cam_near_far is not None:
            s.cam_near_far = scene.cam_near_far[idx]
        if scene.masks is not None:
            s.masks = scene.masks[idx]
        return s

    mask_valid_idx = None
    if cfg.with_mask and cfg.mask_root:
        scene.masks, mask_valid_idx = load_object_masks(
            cfg.mask_root, scene.img_names, scene.H, scene.W,
            auto_seg=cfg.auto_seg,
        )

    init_params = None
    if (cfg.with_sam or cfg.with_mask) and cfg.init_ckpt:
        init_params = load_init_params(cfg.init_ckpt)

    trainer = Trainer("ngp", cfg, model, cfg.workspace,
                      use_checkpoint=cfg.ckpt, init_params=init_params)

    sam_predictor = None
    if cfg.with_sam or (cfg.decode and cfg.use_point):
        from .sam import build_sam, SamPredictor

        ckpt = cfg.sam_ckpt if os.path.exists(cfg.sam_ckpt) else None
        sam = build_sam(cfg.sam_model_type, checkpoint=ckpt,
                        hq=(cfg.sam_type == "sam_hq"))
        sam_predictor = SamPredictor(sam)
        if ckpt is None:
            trainer.log(f"[WARN] SAM checkpoint {cfg.sam_ckpt} not found; "
                        "using random weights")

    n = scene.poses.shape[0]
    train_idx = split_indices(n, cfg.train_split, cfg.val_type,
                              test_view_names, scene.img_names,
                              auto_seg=cfg.auto_seg)
    val_type = ("val_all" if cfg.with_sam and cfg.feature_container == "cache"
                else cfg.val_type)
    val_idx = split_indices(n, cfg.test_split, val_type, test_view_names,
                            scene.img_names, auto_seg=cfg.auto_seg)
    if mask_valid_idx is not None and not cfg.test:
        # stage-3 trains only on the valid-mask view subset (provider.py:723-737)
        train_idx = np.array([i for i in train_idx if i in set(mask_valid_idx)])
    train_scene = subset(scene, train_idx)
    val_scene = subset(scene, val_idx)

    if cfg.render_trajectory or (cfg.test and cfg.camera_traj and
                                 (cfg.circle or cfg.trajectory_root)):
        # synthesized camera path rendering (provider.py:504-609)
        import copy

        from .data.trajectory import (
            load_recorded_trajectories,
            synthesize_test_poses,
        )

        tscene = copy.copy(scene)
        tscene.images = None
        if cfg.trajectory_root and os.path.isdir(cfg.trajectory_root):
            # replay GUI-recorded trajectories (provider.py:504-544)
            tposes, tintr, tnames = load_recorded_trajectories(
                cfg.trajectory_root)
            tscene.poses = tposes
            tscene.intrinsics = tintr
            tscene.img_names = tnames
            tscene.H = tscene.W = 1024
        else:
            traj = "circle" if cfg.circle else cfg.camera_traj
            tposes = synthesize_test_poses(train_scene.poses, traj)
            tscene.poses = tposes
            tscene.intrinsics = (scene.intrinsics[0]
                                 if scene.intrinsics.ndim == 2
                                 else scene.intrinsics)
            tscene.img_names = np.array(
                [f"traj_{i:04d}" for i in range(len(tposes))])
        tscene.cam_near_far = None
        tscene.masks = None
        trainer.test(tscene,
                     save_dir=os.path.join(cfg.workspace, "trajectory"),
                     write_video=True)
        return trainer

    if cfg.gui:
        # browser viewer over the headless GUI API (render/web_viewer.py);
        # replaces the reference's dearpygui window (main.py:269-314)
        from .render.gui_api import InteractiveSession
        from .render.web_viewer import serve

        sess = InteractiveSession(
            trainer, scene=None if cfg.test else train_scene,
            W=cfg.W, H=cfg.H, fovy=cfg.fovy, radius=cfg.radius)
        serve(sess, points_path=os.path.join(cfg.workspace,
                                             "picked_points.json"),
              right_drag_pan=cfg.gui_mouse_right_drag)
        return trainer

    if cfg.test:
        if cfg.decode:
            from .utils.points import load_point_file

            prompts = load_point_file(cfg.point_file)
            stages.decode(trainer, val_scene, sam_predictor, prompts,
                          feature_container=cfg.feature_container)
        elif cfg.with_mask:
            # evaluate_masks always saves {stem}_mask.npy probabilities —
            # a superset of --return_extra's mask branch
            # (nerf/trainer.py:1157-1160)
            stages.evaluate_masks(
                trainer, val_scene,
                save_dir=os.path.join(cfg.workspace, "results"),
                render_mask_type=cfg.render_mask_type,
            )
        else:
            # --return_extra (nerf/trainer.py:886): with_sam test runs also
            # save the rendered 64x64 feature map per view
            extra = "sam" if (cfg.return_extra and cfg.with_sam) else None
            trainer.test(val_scene, write_video=False, extra=extra)
        return trainer

    # train
    if cfg.with_sam:
        if cfg.feature_container == "cache":
            stages.store_sam_features(trainer, val_scene, sam_predictor)
        else:
            on_device = getattr(args, "on_device_sam", None)
            if on_device is None:
                # auto: the fused render->encode program is the TPU-native
                # path (SURVEY §7 'hard parts'); on CPU the host loop wins
                import jax

                on_device = jax.default_backend() == "tpu"
            stages.train_sam_distill(trainer, train_scene, sam_predictor,
                                     on_device=on_device)
            # stage-2 eval: rendered-feature MSE (nerf/trainer.py:648-691)
            stages.evaluate_sam_features(trainer, val_scene, sam_predictor)
    elif cfg.with_mask:
        stages.train_mask(trainer, train_scene)
        stages.evaluate_masks(trainer, val_scene)
    else:
        trainer.train(train_scene, val_scene)
        meters = [M.PSNRMeter(), M.SSIMMeter()]
        lp = M.LPIPSMeter()
        if lp.available:
            meters.append(lp)
        trainer.evaluate(val_scene, meters=meters,
                         save_dir=os.path.join(cfg.workspace, "validation"))
    return trainer


if __name__ == "__main__":
    main()
