"""Host-side training driver for the three stages.

Replaces the reference's Trainer god-object (nerf/trainer.py:22-1843) with a
thin loop around jitted steps: all hot work (ray sampling, rendering,
losses, optimizer) is on-device; the host only schedules, logs, checkpoints
and writes artifacts.

Epoch math mirrors main.py:287-292: steps_per_epoch = number of training
views; max_epoch = ceil(iters / steps_per_epoch); eval/save intervals
derived from eval_cnt/save_cnt.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.provider import Scene
from ..data.sampler import sample_rgb_batch
from ..data.rays import full_frame_rays
from .checkpoints import CheckpointManager, partial_load
from .metrics import PSNRMeter
from .state import TrainState, create_train_state, freeze_mask_from_loaded
from .steps import make_rgb_train_step, make_eval_render


class Logger:
    """Rank-0 console + append-mode log file (nerf/trainer.py:164-168)."""

    def __init__(self, workspace: str, name: str = "ngp"):
        os.makedirs(workspace, exist_ok=True)
        self.path = os.path.join(workspace, f"log_{name}.txt")

    def __call__(self, *args):
        msg = " ".join(str(a) for a in args)
        print(msg, flush=True)
        with open(self.path, "a") as f:
            f.write(msg + "\n")


# top-level param-collection names of the NeRF backbone (MLPField): the
# weights the fused render megakernels consume.  Side-output steps may
# only take the frozen-backbone fast path when ALL of these are frozen.
_BACKBONE_KEYS = ("trunk", "prop_mlp_0", "prop_mlp_1", "view_mlp",
                  "cp_x", "cp_y", "cp_z",
                  "grid", "prop_grid_0", "prop_grid_1", "sigma_mlp")


def _backbone_all_frozen(freeze_mask) -> bool:
    """True iff the freeze mask freezes every backbone param present."""
    if freeze_mask is None:
        return False
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(freeze_mask["params"]))
    hits = [v for path, v in flat.items() if path[0] in _BACKBONE_KEYS]
    return bool(hits) and all(bool(v) for v in hits)


class Trainer:
    def __init__(self, name: str, cfg: Config, model, workspace: str,
                 sam_predictor=None, use_checkpoint: str = "latest",
                 init_params=None):
        self.name = name
        self.cfg = cfg
        self.model = model
        self.workspace = workspace
        self.sam_predictor = sam_predictor
        self.log = Logger(workspace, name)
        self.ckpt = CheckpointManager(workspace, max_keep=2)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, init_key = jax.random.split(key)
        params = model.init(init_key, jnp.zeros((4, 3)), jnp.ones((4, 3)))

        freeze_mask = None
        if init_params is not None:
            # cross-stage hand-off: load stage-1 weights, freeze them by
            # membership (main.py:249-256)
            params, loaded_keys = partial_load(params, init_params)
            freeze_mask = freeze_mask_from_loaded(params, init_params)
            self.log(f"[INFO] loaded {len(loaded_keys)} param tensors from "
                     f"init checkpoint (frozen)")
        # True iff every NeRF-backbone param is frozen by the mask: the
        # stage-2/3 steps may then render the backbone through the
        # stop-gradient inference megakernels (renderer frozen_backbone)
        self.backbone_frozen = _backbone_all_frozen(freeze_mask)

        lr_scales = None
        from ..models.mlp_field import MLPField

        if isinstance(model, MLPField):
            from .state import mlp_field_lr_scales

            lr_scales = mlp_field_lr_scales(params)
        self.state = create_train_state(
            params, base_lr=cfg.lr, total_iters=cfg.iters,
            freeze_mask=freeze_mask, lr_scales=lr_scales,
        )

        # resume.  Optimizer restore is best-effort, matching the reference
        # (nerf/trainer.py:1807-1830 wraps optimizer/scheduler load in
        # try/except): a stage-3 checkpoint written under a freeze-mask
        # optimizer must still be loadable for --test without --init_ckpt,
        # where the default optimizer's opt_state tree differs.
        if use_checkpoint == "latest":
            try:
                restored = self.ckpt.restore("latest", self._state_tree())
            except ValueError:
                restored = None
                raw = self.ckpt.restore("latest")
                if raw is not None:
                    params, _ = partial_load(self.state.params, raw["params"])
                    ema, _ = partial_load(self.state.ema_params,
                                          raw["ema_params"])
                    self.state = self.state.replace(
                        step=jnp.asarray(raw["step"]),
                        params=params, ema_params=ema,
                        ema_updates=jnp.asarray(
                            raw.get("ema_updates", 200), jnp.int32))
                    self.log("[WARN] checkpoint optimizer state does not "
                             "match the current optimizer; loaded model "
                             "weights only (resumed at step "
                             f"{int(self.state.step)})")
            if restored is not None:
                self._load_state_tree(restored)
                self.log(f"[INFO] resumed at step {int(self.state.step)}")

        self.train_step = make_rgb_train_step(model, cfg, donate=False)
        self.eval_render = make_eval_render(model, cfg)
        self._full_step = None
        self.best_metric = -np.inf
        self.stats = {"loss": [], "psnr": []}

    # -- state (de)serialization ------------------------------------------
    def _state_tree(self):
        return {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema_params,
            "ema_updates": self.state.ema_updates,
        }

    def _load_state_tree(self, tree):
        self.state = self.state.replace(
            step=jnp.asarray(tree["step"]),
            params=tree["params"],
            opt_state=tree["opt_state"],
            ema_params=tree["ema_params"],
            # pre-ramp checkpoints lack the counter; resume with the
            # asymptotic decay (a step count is an equally good stand-in
            # but the exact value only matters for the first ~180 epochs)
            ema_updates=jnp.asarray(tree.get("ema_updates", 200),
                                    jnp.int32),
        )

    # -- stage 1 -----------------------------------------------------------
    def train(self, scene: Scene, val_scene: Optional[Scene] = None,
              max_epoch: Optional[int] = None):
        cfg = self.cfg
        if cfg.adaptive_num_rays and not cfg.with_sam and not cfg.with_mask:
            # the reference rescales num_rays each step so that
            # num_rays * num_steps[-1] == num_points (nerf/trainer.py:395-397)
            # — with fixed proposal levels that recursion converges to a
            # CONSTANT after one step, so we jump straight to the fixed
            # point and keep shapes static (no recompiles)
            target = max(1, cfg.num_points // cfg.num_steps[-1])
            if target != cfg.num_rays:
                self.log(f"[INFO] adaptive_num_rays: {cfg.num_rays} -> "
                         f"{target} (num_points {cfg.num_points} / "
                         f"final-level samples {cfg.num_steps[-1]})")
                cfg = cfg.replace(num_rays=target)
                self.cfg = cfg
                # train step closure captures cfg.num_rays only through the
                # batch shapes; rebuild to be safe
                self.train_step = make_rgb_train_step(self.model, cfg,
                                                      donate=False)
                self._full_step = None
        images = jnp.asarray(scene.images)
        poses = jnp.asarray(scene.poses)
        # per-view [V, 4] intrinsics are kept per-view: the sampler indexes
        # them by img_inds so heterogeneous-camera COLMAP scenes train with
        # each view's own focal (reference collate, nerf/provider.py:918)
        intr = jnp.asarray(scene.intrinsics)
        # sparse-depth per-view [near, far] tightens ray bounds during
        # training when --enable_cam_near_far (nerf/provider.py:464-502
        # consumed at nerf/renderer.py:231-234)
        cnf = (jnp.asarray(scene.cam_near_far)
               if cfg.enable_cam_near_far and scene.cam_near_far is not None
               else None)
        n_views = scene.poses.shape[0]
        steps_per_epoch = n_views
        if max_epoch is None:
            max_epoch = int(np.ceil(cfg.iters / steps_per_epoch))
        eval_interval = max(1, max_epoch // max(1, cfg.eval_cnt))
        save_interval = max(1, max_epoch // max(1, cfg.save_cnt))
        self.log(f"[INFO] max_epoch {max_epoch}, eval every {eval_interval}, "
                 f"save every {save_interval}")

        if self._full_step is None:
            train_step = self.train_step
            mesh = None
            if len(jax.devices()) > 1:
                # data-parallel mesh: rays sharded, params replicated
                from ..parallel import make_mesh, data_sharding

                mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
                shard = data_sharding(mesh, cfg.mesh_axis_names[0])
                self.log(f"[INFO] sharding rays over mesh {dict(mesh.shape)}")

            @jax.jit
            def full_step(state, key):
                kb, kr = jax.random.split(key)
                batch = sample_rgb_batch(
                    kb, images, poses, intr, cfg.num_rays,
                    random_image_batch=cfg.random_image_batch,
                    cam_near_far=cnf,
                )
                if mesh is not None:
                    batch = {
                        k: jax.lax.with_sharding_constraint(v, shard)
                        for k, v in batch.items()
                    }
                batch["step"] = state.step
                return train_step(state, batch, kr)

            full_step = self._full_step = full_step

            # chain a whole epoch of steps DEVICE-side: per-step host
            # dispatch costs a tunnel round-trip (~27 ms) and
            # int(state.step) blocks on it — one scan per epoch brings the
            # CLI trainer to the benched step rate (see bench.py timing
            # notes)
            @functools.partial(jax.jit, static_argnums=(2, 3))
            def run_epoch(state, key, k, ema):
                def body(st, i):
                    return full_step(st, jax.random.fold_in(key, i))

                state, ms = jax.lax.scan(body, state, jnp.arange(k))
                # EMA per epoch (nerf/trainer.py:1522) inside the jit —
                # the unjitted tree.map costs one dispatch round-trip PER
                # LEAF through the device tunnel; applied on the LAST
                # chunk of the epoch only
                if ema:
                    state = state.update_ema()
                return state, jax.tree.map(lambda x: x[-1], ms)

            self._run_epoch = run_epoch

        t_start = time.time()
        py_step = step0 = int(self.state.step)  # single sync, then host-side
        # scan chunks are capped: very long device-side scans of the
        # HASH-GRID step (scatter_add backward) crash the TPU worker —
        # r3 production at 112 steps, and the standalone reproducer
        # (scripts/scatter_backward_probe.py crash, r4) at 32, while
        # small scans of the same body run fine.  Platform fault, not a
        # framework bug — docs/PERF.md "Long-scan worker crash".  16
        # stays under both observed thresholds and still amortizes the
        # ~27 ms dispatch RTT >50x (hashgrid steps are gather-bound,
        # tens of ms each).  The scatter-free fields (mlp flagship:
        # matmul-only megakernel backward) have never crashed and scan
        # whole epochs.
        SCAN_CAP = 16 if "hashgrid" in getattr(
            self.model, "field_kind", "hashgrid") else 256

        # 1-deep log pipeline: pulling an epoch's metrics blocks on the
        # device tunnel (~27 ms RTT), so log epoch e only after epoch e+1
        # is dispatched — the pull then overlaps device compute instead of
        # serializing every epoch on a round-trip
        pending = None

        def _flush():
            nonlocal pending
            if pending is None:
                return
            ep, st, m = pending
            pending = None
            loss = float(jax.device_get(m["loss"]))
            psnr = float(jax.device_get(m["psnr"]))
            self.log(f"[epoch {ep}/{max_epoch}] step {st} "
                     f"loss={loss:.5f} train_psnr={psnr:.2f} "
                     f"lr={self._lr(st):.5f}")
            self.stats["loss"].append(loss)

        for epoch in range(1, max_epoch + 1):
            k = min(steps_per_epoch, cfg.iters - py_step)
            if k <= 0:
                break
            self.key, sub = jax.random.split(self.key)
            done = 0
            while done < k:
                kc = min(SCAN_CAP, k - done)
                sub = jax.random.fold_in(sub, done)
                self.state, metrics = self._run_epoch(
                    self.state, sub, kc, done + kc >= k)
                done += kc
            py_step += k
            _flush()
            pending = (epoch, py_step, metrics)
            if epoch % save_interval == 0 or epoch == max_epoch:
                _flush()
                self.ckpt.save(py_step, self._state_tree())
            if val_scene is not None and (epoch % eval_interval == 0
                                          or epoch == max_epoch):
                _flush()
                score = self.evaluate(val_scene, save_dir=None)
                if score > self.best_metric:
                    self.best_metric = score
                    self.ckpt.save(py_step, self._state_tree(), best=True)
            if py_step >= cfg.iters:
                break
        _flush()
        dt = (time.time() - t_start) / 60
        nsteps = py_step - step0
        self.log(f"[INFO] training took {dt:.2f} min "
                 f"({nsteps / max(dt * 60, 1e-9):.1f} steps/s)")

    def _lr(self, step=None):
        if step is None:
            step = int(self.state.step)
        frac = min(step / self.cfg.iters, 1.0)
        return self.cfg.lr * 0.1 ** frac

    # -- eval / test --------------------------------------------------------
    def render_view(self, pose, intrinsics, H, W, params=None,
                    cam_near_far=None, bg_color=1.0, aabb=None, key=None):
        """Full-frame render.  `aabb` overrides the inference bounding box
        (reference model.aabb_infer, nerf/gui.py:349-352); `key` jitters
        sampling for GUI SPP accumulation (a perturbed render variant is
        built lazily on first use)."""
        ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(intrinsics),
                                 H, W)
        cnf = None
        if cam_near_far is not None:
            cnf = jnp.asarray(cam_near_far).reshape(1, 2)
        if key is not None:
            if not hasattr(self, "_eval_render_perturb"):
                self._eval_render_perturb = make_eval_render(
                    self.model, self.cfg, perturb=True)
            render = self._eval_render_perturb
        elif len(jax.devices()) > 1:
            # full-frame eval rays sharded over the data axis: each device
            # renders its slice via the staged renderer inside a shard_map
            # (parallel/evaluate.py; replaces the reference's dead
            # all_gather eval, nerf/trainer.py:1577-1601)
            if not hasattr(self, "_sharded_render"):
                from ..parallel import make_mesh, make_sharded_render
                from ..render.renderer import RenderSettings

                cfg = self.cfg
                mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
                settings = RenderSettings(
                    num_steps=tuple(cfg.num_steps),
                    use_contract=cfg.contract, min_near=cfg.min_near,
                    background=cfg.background, bound=cfg.bound,
                    max_ray_batch=cfg.max_ray_batch)
                self._sharded_render = make_sharded_render(
                    self.model, settings, mesh, cfg.mesh_axis_names[0])
            render = self._sharded_render
        else:
            render = self.eval_render
        out = render(
            params if params is not None else self.state.ema_params,
            ro, rd, bg_color=bg_color, cam_near_far=cnf,
            aabb=None if aabb is None else jnp.asarray(aabb, jnp.float32),
            key=key,
        )
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def evaluate(self, scene: Scene, meters=None, save_dir: Optional[str] = None,
                 use_ema: bool = True, max_views: Optional[int] = None) -> float:
        meters = meters or [PSNRMeter()]
        params = self.state.ema_params if use_ema else self.state.params
        n = scene.poses.shape[0] if max_views is None else min(
            max_views, scene.poses.shape[0])
        for i in range(n):
            intr = (scene.intrinsics[i] if scene.intrinsics.ndim == 2
                    else scene.intrinsics)
            cnf = (scene.cam_near_far[i] if scene.cam_near_far is not None
                   else None)
            out = self.render_view(scene.poses[i], intr, scene.H, scene.W,
                                   params=params, cam_near_far=cnf)
            pred = out["image"].reshape(scene.H, scene.W, 3)
            gt = None
            if scene.images is not None:
                gt = scene.images[i][..., :3]
                for m in meters:
                    m.update(pred, gt)
            if save_dir is not None:
                # reference validation artifact set (nerf/trainer.py:1613-1656):
                # {stem}_rgb.png / _depth.npy / _gt.png, plus an error image
                # (|gt - pred| mean over channels; the reference computes this
                # at trainer.py:1645 behind a dead save_path_error)
                os.makedirs(save_dir, exist_ok=True)
                stem = (os.path.splitext(str(scene.img_names[i]))[0]
                        if scene.img_names is not None else f"{i:04d}")
                _save_image(os.path.join(save_dir, f"{stem}_rgb.png"), pred)
                np.save(os.path.join(save_dir, f"{stem}_depth.npy"),
                        out["depth"].reshape(scene.H, scene.W))
                if gt is not None:
                    _save_image(os.path.join(save_dir, f"{stem}_gt.png"), gt)
                    err = np.abs(gt.astype(np.float32) - pred).mean(-1)
                    _save_image(os.path.join(save_dir, f"{stem}_error.png"),
                                np.repeat(err[..., None], 3, -1))
        for m in meters:
            self.log("[EVAL] " + m.report())
        return meters[0].measure() if meters else 0.0

    def test(self, scene: Scene, save_dir: Optional[str] = None,
             write_video: bool = False, extra: Optional[str] = None):
        """Render every pose and save rgb/depth artifacts.

        extra='sam'|'mask' additionally saves the per-view extra output
        (--return_extra, nerf/trainer.py:886 + 1136-1160): 'sam' renders
        the 64x64 feature map from the feature field to {stem}_sam.npy;
        'mask' renders full-res instance-mask probabilities to
        {stem}_mask.npy."""
        save_dir = save_dir or os.path.join(self.workspace, "results")
        os.makedirs(save_dir, exist_ok=True)
        extra_render = None
        if extra in ("sam", "mask"):
            extra_render = make_eval_render(
                self.model, self.cfg, return_feats=(extra == "sam"),
                return_mask=(extra == "mask"))
        frames = []
        for i in range(scene.poses.shape[0]):
            intr = (scene.intrinsics[i] if scene.intrinsics.ndim == 2
                    else scene.intrinsics)
            out = self.render_view(scene.poses[i], intr, scene.H, scene.W)
            pred = out["image"].reshape(scene.H, scene.W, 3)
            name = (scene.img_names[i] if scene.img_names is not None
                    else f"{i:04d}")
            stem = os.path.splitext(str(name))[0]
            _save_image(os.path.join(save_dir, f"{stem}_rgb.png"), pred)
            np.save(os.path.join(save_dir, f"{stem}_depth.npy"),
                    out["depth"].reshape(scene.H, scene.W))
            if extra == "sam":
                # aspect-preserving low-res feature rays, same camera
                # (provider.py:1091-1106 uses a square online camera; with
                # native W != H intrinsics the SAM-aligned render is the
                # fh x fw valid block of the padded 64x64 grid —
                # lowres_feature_camera docstring)
                from .stages import lowres_feature_camera

                f_intr, fh, fw = lowres_feature_camera(
                    intr, scene.H, scene.W)
                ro, rd = full_frame_rays(jnp.asarray(scene.poses[i]),
                                         jnp.asarray(f_intr), fh, fw)
                fo = extra_render(self.state.params, ro, rd)
                np.save(os.path.join(save_dir, f"{stem}_sam.npy"),
                        np.asarray(fo["samvit"]).reshape(fh, fw, -1))
            elif extra == "mask":
                ro, rd = full_frame_rays(jnp.asarray(scene.poses[i]),
                                         jnp.asarray(intr), scene.H, scene.W)
                mo = extra_render(self.state.params, ro, rd)
                logits = np.asarray(mo["instance_mask_logits"]).reshape(
                    scene.H, scene.W, -1)
                np.save(os.path.join(save_dir, f"{stem}_mask.npy"), logits)
            if write_video:
                frames.append((pred * 255).astype(np.uint8))
        if write_video and frames:
            _write_video(os.path.join(save_dir, "video.mp4"), frames)
        self.log(f"[INFO] test results saved to {save_dir}")


def _save_image(path: str, img: np.ndarray):
    import cv2

    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))


def _write_video(path: str, frames, fps: int = 24):
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8)
    except Exception as e:  # imageio-ffmpeg may be missing
        print(f"[WARN] video write failed ({e}); saving frames only")
