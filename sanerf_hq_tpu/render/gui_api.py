"""GUI-shaped interactive API: render-one-frame + incremental training.

The reference ships a dearpygui desktop viewer (nerf/gui.py) driving
Trainer.train_gui / test_gui (nerf/trainer.py:1194-1328).  On a headless
TPU pod the equivalent is this API: an OrbitCamera with the same
pose/intrinsics math, `test_gui`-shaped render_frame (arbitrary pose,
downscale factor), and `train_gui`-shaped train_ticks (N steps between
frames).  A web/notebook front-end can drive it directly.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np


class OrbitCamera:
    """Same math as nerf/gui.py:10-70: orbit/pan/scale around a center."""

    def __init__(self, W: int, H: int, r: float = 2.0, fovy: float = 60.0):
        self.W = W
        self.H = H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        # rotation stored as 3x3 (reference uses scipy Rotation)
        self.rot = np.eye(3, dtype=np.float32)
        self.up = np.array([0, 1, 0], np.float32)
        # bumped on every mutation; SPP accumulation resets when it changes
        self.version = 0

    @property
    def pose(self) -> np.ndarray:
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = self.rot
        pose[:3, 3] = self.rot @ np.array([0, 0, self.radius], np.float32) \
            + self.center
        return pose

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.H / (2 * np.tan(np.deg2rad(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2], np.float32)

    def orbit(self, dx: float, dy: float):
        def rotmat(axis, angle):
            axis = axis / np.linalg.norm(axis)
            K = np.array([[0, -axis[2], axis[1]],
                          [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]])
            return (np.eye(3) + np.sin(angle) * K
                    + (1 - np.cos(angle)) * K @ K).astype(np.float32)

        side = self.rot[:, 0]
        self.rot = rotmat(self.up, -dx * 0.005) @ rotmat(side, -dy * 0.005) \
            @ self.rot
        self.version += 1

    def scale(self, delta: float):
        self.radius *= 1.1 ** (-delta)
        self.version += 1

    def pan(self, dx: float, dy: float, dz: float = 0.0):
        self.center += 0.0005 * self.rot @ np.array([dx, dy, dz], np.float32)
        self.version += 1

    def set_fovy(self, fovy: float):
        """fovy slider (nerf/gui.py fovy widget)."""
        self.fovy = float(np.clip(fovy, 10.0, 120.0))
        self.version += 1


class InteractiveSession:
    """train_gui/test_gui equivalent driving a Trainer."""

    def __init__(self, trainer, scene=None, W: int = 512, H: int = 512,
                 fovy: float = 60.0, radius: float = 2.0):
        self.trainer = trainer
        self.scene = scene
        self.camera = OrbitCamera(W, H, r=radius, fovy=fovy)
        self._train_steps = 16  # dynamic, targets ~0.5s per tick (gui.py:112-134)
        # widget state (nerf/gui.py:189-473)
        self.bg_color = 1.0                  # bg-color picker
        self.aabb: Optional[np.ndarray] = None  # crop sliders -> aabb_infer
        self.spp = 1                         # SPP accumulation target
        self.trajectory: list = []           # recorded camera keyframes
        self._accum = None                   # [H, W, 3] running mean
        self._accum_n = 0
        self._accum_sig = None

    def set_aabb(self, lo=None, hi=None):
        """Crop sliders: clamp the inference AABB (model.aabb_infer,
        nerf/gui.py:349-352).  None resets to the training bound."""
        if lo is None and hi is None:
            self.aabb = None
        else:
            b = self.trainer.cfg.bound
            lo = np.clip(np.asarray(lo, np.float32), -b, b)
            hi = np.clip(np.asarray(hi, np.float32), -b, b)
            self.aabb = np.concatenate([lo, np.maximum(hi, lo + 1e-3)])
        self._accum_sig = None  # invalidate accumulation

    def record_pose(self):
        """Trajectory record button (nerf/gui.py trajectory widgets)."""
        self.trajectory.append(self.camera.pose.copy())
        return len(self.trajectory)

    def save_trajectory(self, path: str):
        """Write keyframes in the replay schema consumed by
        data/trajectory.py:load_recorded_trajectories (reference
        provider.py:504-544): {'trajectory': [[4x4], ...]}."""
        import json

        with open(path, "w") as f:
            json.dump({"trajectory": [p.tolist() for p in self.trajectory]},
                      f)
        return len(self.trajectory)

    def render_frame(self, pose: Optional[np.ndarray] = None,
                     downscale: int = 1) -> dict:
        """test_gui-shaped: render one frame at W/downscale x H/downscale.

        With spp > 1 and a static camera/widget state, successive calls
        accumulate perturbed renders into a running mean (reference SPP
        accumulation, nerf/gui.py:145-186); any interaction resets it."""
        cam = self.camera
        explicit_pose = pose is not None
        pose = pose if explicit_pose else cam.pose
        H, W = cam.H // downscale, cam.W // downscale
        intr = cam.intrinsics / downscale
        intr[2], intr[3] = W / 2, H / 2
        t0 = time.perf_counter()

        sig = (cam.version, downscale, float(self.bg_color), cam.fovy)
        if (self.spp > 1 and not explicit_pose and sig == self._accum_sig
                and self._accum_n >= self.spp):
            # saturated: serve the converged accumulation without rendering
            return {"image": self._accum, "depth": self._last_depth,
                    "spp": self._accum_n, "time": 0.0, "fps": float("inf")}
        accumulate = (self.spp > 1 and not explicit_pose
                      and sig == self._accum_sig
                      and self._accum_n < self.spp)
        if self.spp > 1 and not explicit_pose:
            import jax

            key = jax.random.PRNGKey(self._accum_n if accumulate else 0)
        else:
            key = None
        out = self.trainer.render_view(pose, intr, H, W,
                                       bg_color=self.bg_color,
                                       aabb=self.aabb, key=key)
        img = out["image"].reshape(H, W, 3)
        if self.spp > 1 and not explicit_pose:
            if accumulate:
                self._accum = (self._accum * self._accum_n + img) / (
                    self._accum_n + 1)
                self._accum_n += 1
            else:
                self._accum = img
                self._accum_n = 1
                self._accum_sig = sig
            img = self._accum
        depth = out["depth"].reshape(H, W)
        self._last_depth = depth
        dt = time.perf_counter() - t0
        return {
            "image": img,
            "depth": depth,
            "spp": self._accum_n if self.spp > 1 else 1,
            "time": dt,
            "fps": 1.0 / max(dt, 1e-9),
        }

    # -- 3-D point prompts (right-click flow, nerf/gui.py:430-441 +
    #    nerf/trainer.py:795-834) -------------------------------------------
    def pick_point(self, px: int, py: int, label: int = 1,
                   dedup_dist: float = 0.01) -> Optional[np.ndarray]:
        """Unproject pixel (px, py) of the current camera through the
        rendered depth into a 3-D point prompt; clicking within dedup_dist
        of an existing point removes it (toggle), like the reference GUI."""
        import jax.numpy as jnp

        from ..data.rays import rays_from_pixels

        frame = self.render_frame()
        depth = frame["depth"]
        H, W = depth.shape
        px = int(np.clip(px, 0, W - 1))
        py = int(np.clip(py, 0, H - 1))
        z = float(depth[py, px])
        ro, rd = rays_from_pixels(
            jnp.asarray(self.camera.pose),
            jnp.asarray(self.camera.intrinsics),
            jnp.asarray([px + 0.5]), jnp.asarray([py + 0.5]),
        )
        point = np.asarray(ro[0]) + np.asarray(rd[0]) * z
        pts = getattr(self, "points_3d", None)
        if pts is None:
            self.points_3d = []
            self.point_labels = []
        else:
            for i, p in enumerate(self.points_3d):
                if np.linalg.norm(p - point) < dedup_dist:
                    self.points_3d.pop(i)
                    self.point_labels.pop(i)
                    return None
        self.points_3d.append(point)
        self.point_labels.append(label)
        return point

    def save_points(self, path: str):
        """Write the picked prompts in the point_file schema
        (example_points.json / nerf/trainer.py:228-255)."""
        import json

        pts = getattr(self, "points_3d", [])
        labels = getattr(self, "point_labels", [])
        out = {
            "points": [p.tolist() for p in pts],
            "negative_labels": [i for i, l in enumerate(labels) if l == 0],
            "valid_threshold": -1,
            "crucial_point_index": [],
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=4)

    def train_ticks(self, target_seconds: float = 0.5) -> dict:
        """train_gui-shaped: run a dynamic number of train steps targeting
        ~target_seconds of wall clock (nerf/trainer.py:1194-1247)."""
        assert self.scene is not None, "training session needs a scene"
        import jax

        tr = self.trainer
        if tr._full_step is None:
            tr.train(self.scene, max_epoch=0)  # builds _full_step only
        t0 = time.perf_counter()
        losses = []
        for _ in range(self._train_steps):
            tr.key, sub = jax.random.split(tr.key)
            tr.state, metrics = tr._full_step(tr.state, sub)
            losses.append(metrics)
        loss = float(losses[-1]["loss"])
        dt = time.perf_counter() - t0
        per_step = dt / self._train_steps
        self._train_steps = int(np.clip(target_seconds / max(per_step, 1e-4),
                                        1, 256))
        return {"loss": loss, "step": int(tr.state.step), "time": dt,
                "steps_per_sec": self._train_steps / max(dt, 1e-9)}
