"""Tiny analytic synthetic scene for end-to-end smoke tests and benches.

A colored sphere at the origin rendered by exact ray-sphere intersection —
no external data needed.  Used by tests (PSNR-climbs assertions) and by
bench.py as a deterministic workload.
"""
from __future__ import annotations

import numpy as np


def look_at_pose(eye, center=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """OpenGL cam2world pose (camera looks along -z)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    z = eye - center
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = x
    pose[:3, 1] = y
    pose[:3, 2] = z
    pose[:3, 3] = eye
    return pose


def render_gt_sphere(pose, intrinsics, H, W, radius=0.5):
    """Ground-truth image of a matte color-by-normal sphere; white bg."""
    fx, fy, cx, cy = intrinsics
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xs = (xx + 0.5 - cx) / fx
    ys = -(yy + 0.5 - cy) / fy
    zs = -np.ones_like(xs)
    dirs = np.stack([xs, ys, zs], -1)
    dirs = dirs @ pose[:3, :3].T
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = pose[:3, 3]

    b = 2 * np.sum(dn * o, -1)
    c = np.sum(o * o) - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    hit = hit & (t > 0)
    p = o + dn * t[..., None]
    normal = p / radius
    color = 0.5 * normal + 0.5
    img = np.where(hit[..., None], color, 1.0).astype(np.float32)
    return img


def make_synthetic_dataset(n_views=12, H=64, W=64, fovy_deg=50.0, radius=2.0,
                           elevation=0.4):
    """Returns dict of numpy arrays: images [V,H,W,3], poses [V,4,4],
    intrinsics [4]."""
    focal = 0.5 * H / np.tan(0.5 * np.deg2rad(fovy_deg))
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
    images, poses = [], []
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        eye = np.array(
            [radius * np.cos(theta), elevation, radius * np.sin(theta)],
            np.float32,
        )
        pose = look_at_pose(eye)
        poses.append(pose)
        images.append(render_gt_sphere(pose, intrinsics, H, W))
    return {
        "images": np.stack(images),
        "poses": np.stack(poses),
        "intrinsics": intrinsics,
        "H": H,
        "W": W,
    }
