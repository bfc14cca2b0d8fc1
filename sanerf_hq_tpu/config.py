"""Static configuration, replacing the reference's mutable argparse namespace.

The reference threads one argparse `opt` object everywhere and mutates it at
runtime (main.py:16-222, nerf/trainer.py:396-397).  Here config is a frozen
dataclass (hashable -> usable as a jit static argument); anything mutable
(adaptive ray count, error maps, caches) lives in explicit training state.

Defaults mirror main.py:16-215 plus the post-parse hard overrides at
main.py:217-222 (fp16=False, bound=128, preload=True, contract=True,
adaptive_num_rays=True).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # paths / workspace
    path: str = ""
    workspace: str = "workspace"
    seed: int = 0
    ckpt: str = "latest"

    # SAM feature options (main.py:26-43)
    with_sam: bool = False
    sam_type: str = "sam"  # 'sam' | 'sam_hq'
    # encoder size; the reference pins vit_h (main.py:258) — smaller
    # variants are an extension for cost-bounded runs
    sam_model_type: str = "vit_h"  # 'vit_h' | 'vit_l' | 'vit_b'
    init_ckpt: str = ""
    sam_ckpt: str = "./pretrained/sam_vit_h_4b8939.pth"
    online_resolution: int = 512
    sam_use_view_direction: bool = False
    sum_after_mlp: bool = False
    cache_size: int = 256
    cache_interval: int = 4
    feature_container: str = "cache"  # 'cache' | 'distill'

    # testing
    save_cnt: int = 20
    eval_cnt: int = 5
    test: bool = False
    camera_traj: str = "interp"

    # dataset
    train_split: str = "train"
    test_split: str = "val"
    preload: bool = True  # forced True, main.py:219
    random_image_batch: bool = False
    downscale: int = 1
    bound: float = 128.0  # forced, main.py:218
    scale: float = -1.0
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    enable_cam_near_far: bool = False
    enable_cam_center: bool = False
    min_near: float = 0.2
    T_thresh: float = 1e-4
    data_type: str = "mip"  # mip|lerf|llff|3dfront|ctr|pano|others
    scene_name: str = "garden"
    object_name: str = "table_whole"

    # training
    iters: int = 20000
    lr: float = 1e-2
    num_steps: Tuple[int, ...] = (128, 64, 32)
    contract: bool = True  # forced, main.py:220
    background: str = "last_sample"  # white | random | last_sample
    max_ray_batch: int = 4096 * 4
    density_thresh: float = 10.0
    num_rays: int = 4096
    adaptive_num_rays: bool = True  # forced, main.py:221
    num_points: int = 2 ** 18
    fp16: bool = False  # forced off, main.py:217

    # regularizers
    lambda_entropy: float = 0.0
    lambda_tv: float = 0.0
    lambda_wd: float = 0.0
    lambda_proposal: float = 1.0
    lambda_distort: float = 0.02
    # Distortion-loss warmup (TPU-native addition, no reference counterpart):
    # applied from the start, the s-space distortion loss is minimized by
    # piling ALL weight onto one sample, and on globally-parameterized
    # fields (freq-MLP flagship) Adam turns that into runaway exponential
    # density growth (sigma 1 -> 4e5 in 50 steps, measured) that walls the
    # near plane before geometry can form — train PSNR plateaus while
    # held-out views render garbage.  Ramping lambda_distort in over
    # [warmup, 2*warmup] steps lets MSE anchor real geometry first; the
    # loss then does its legitimate late-stage floater cleanup.  0 disables
    # the warmup (exact reference behavior, nerf/trainer.py:386-388).
    lambda_distort_warmup: int = 1000

    # mask stage
    with_mask: bool = False
    mask_mlp_type: str = "default"  # default | lightweight_mask
    mask_root: Optional[str] = None
    test_view_path: Optional[str] = None
    n_inst: int = 2
    label_regularization_weight: float = 0.0
    ray_jittering: bool = False

    # ray-pair RGB loss
    ray_pair_rgb_loss_weight: float = 0.0
    ray_pair_rgb_threshold: float = 0.3
    epsilon: float = 1e-6
    ray_pair_rgb_exp_weight: float = 10.0
    ray_pair_rgb_num_sample: int = 1
    ray_pair_rgb_iter: int = -1
    ray_pair_rgb_use_pred_logistics: bool = False
    mixed_sampling: bool = False
    local_sample_patch_size: int = 16
    num_local_sample: int = 2
    error_map: bool = False
    error_map_size: int = 128
    return_extra: bool = False

    # decode / eval
    decode: bool = False
    point_file: Optional[str] = None
    use_point: bool = False
    use_default_intrinsics: bool = False
    use_default_focal_length: bool = False
    use_gt_focal_length: bool = False
    val_type: str = "default"  # default | val_all | val_split
    render_mask_type: str = "heatmap"  # mask | composition | heatmap
    render_mask_instance_id: int = 0
    val_save_root: Optional[str] = None
    auto_seg: bool = False

    # GUI
    gui: bool = False
    W: int = 512
    H: int = 512
    radius: float = 0.5
    fovy: float = 60.0
    max_spp: int = 1
    gui_mouse_right_drag: bool = False  # right-drag rotates around center
    vis_pose: bool = False  # dump a camera-pose visualization and continue

    # trajectory
    trajectory_root: Optional[str] = None
    render_trajectory: bool = False
    circle: bool = False

    # --- TPU-native additions (no reference counterpart) ---
    # 'hashgrid' = reference-parity Instant-NGP field (gather-bound on TPU);
    # 'mlp' = TPU-native flagship (MXU-bound freq-MLP field, see
    # models/mlp_field.py for the measured rationale)
    field_type: str = "hashgrid"
    # flagship (mlp) field extras: CP-factorized spatial features give the
    # freq-MLP hash-grid-class convergence (train PSNR 25 vs 16 at 1200
    # steps on the rich scene, measured) while staying matmul/gather-lite;
    # density_bias shifts the initial density exp(raw + bias)
    cp_rank: int = 64
    cp_res: int = 256
    density_bias: float = 0.0
    # feature-container representation for the mlp flagship's s_grid/m_grid:
    # 'cp' (rank-R CP volumes + projection — matmul-bound on TPU, the
    # shipping default) or 'hashgrid' (reference-like trained hash volume,
    # gather/scatter-bound; see models/mlp_field.py feat_rep docstring)
    feat_rep: str = "cp"
    feat_rank: int = 128
    feat_res: int = 256
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel mesh over all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)
    param_dtype: str = "float32"
    use_pallas: bool = True  # pallas fast path for hot kernels when on TPU

    # ------------------------------------------------------------------
    @property
    def grid_bound(self) -> float:
        """Bound used for grid queries: contraction maps the world into
        [-2, 2]^3 (nerf/renderer.py:149-155)."""
        return 2.0 if self.contract else self.bound

    @property
    def samples_per_ray(self) -> int:
        return sum(self.num_steps)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def stage1_config(**kw) -> Config:
    """Stage-1 RGB NeRF defaults (scripts/train_rgb_nerf.sh)."""
    base = dict(iters=5000, random_image_batch=True, lambda_proposal=1.0,
                lambda_distort=0.02)
    base.update(kw)
    return Config(**base)


def stage2_config(**kw) -> Config:
    """Stage-2 SAM feature container defaults (scripts/train_sam_nerf.sh)."""
    base = dict(with_sam=True, iters=5000)
    base.update(kw)
    return Config(**base)


def stage3_config(**kw) -> Config:
    """Stage-3 object-field defaults (scripts/train_obj_nerf.sh)."""
    base = dict(with_mask=True, iters=200, num_rays=6000,
                ray_pair_rgb_loss_weight=1.0, ray_pair_rgb_threshold=0.1,
                ray_pair_rgb_iter=150, ray_pair_rgb_num_sample=8,
                local_sample_patch_size=8, num_local_sample=4,
                mixed_sampling=True, error_map=True)
    base.update(kw)
    return Config(**base)
