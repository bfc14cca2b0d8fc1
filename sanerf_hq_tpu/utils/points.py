"""3-D point-prompt management and projection.

Reference: nerf/trainer.py:86-112 (point file schema), :936-971 (projection,
occlusion rejection, validity gate).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np


@dataclasses.dataclass
class PointPrompts:
    points: np.ndarray          # [N, 3] world coords
    labels: np.ndarray          # [N] 1=positive, 0=negative
    crucial_label: np.ndarray   # [N] 1 if crucial
    crucial_count: int
    valid_threshold: int


def load_point_file(path: str) -> PointPrompts:
    with open(path) as f:
        pj = json.load(f)
    points = np.asarray(pj["points"], np.float32)
    labels = np.ones(points.shape[0], np.int32)
    for i in pj.get("negative_labels", []):
        labels[i] = 0
    crucial = np.zeros(points.shape[0], np.int32)
    for i in pj.get("crucial_point_index", []):
        crucial[i] = 1
    vt = int(pj.get("valid_threshold", -1))
    if vt == -1:
        vt = int(points.shape[0] * 0.8) + 1
    return PointPrompts(points, labels, crucial,
                        len(pj.get("crucial_point_index", [])), vt)


def project_points_to_view(prompts: PointPrompts, pose: np.ndarray,
                           intrinsics: np.ndarray, H: int, W: int,
                           pred_depth: Optional[np.ndarray] = None,
                           depth_tol: float = 0.05,
                           info: Optional[dict] = None):
    """Project world points into a view with screen-bounds + depth-test
    occlusion rejection (nerf/trainer.py:936-971).

    Note the reference's x-flip: x = W - (fx*X/Z + cx).
    Returns (coords [M, 2] int32 (x, y), labels [M], crucial [M], is_valid).
    If `info` is a dict, fills it with per-point gate diagnostics
    ("depth_err": |point z - rendered depth| for each on-screen point).
    """
    pts_h = np.concatenate(
        [prompts.points, np.ones_like(prompts.points[:, :1])], axis=-1
    )  # [N, 4]
    w2c = np.linalg.inv(pose)
    cam = pts_h @ w2c.T  # [N, 4]
    fx, fy, cx, cy = intrinsics[:4]
    with np.errstate(divide="ignore", invalid="ignore"):
        x = (W - (fx * cam[:, 0] / cam[:, 2] + cx)).astype(np.int64)
        y = (fy * cam[:, 1] / cam[:, 2] + cy).astype(np.int64)
    coords = np.stack([x, y], axis=-1)
    screen = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    if not screen.any():
        return None, None, None, False
    coords = coords[screen]
    labels = prompts.labels[screen]
    crucial = prompts.crucial_label[screen]
    if pred_depth is not None:
        point_depth = -cam[screen, 2]
        observed = pred_depth[coords[:, 1], coords[:, 0]]
        err = np.abs(point_depth - observed)
        if info is not None:
            info["depth_err"] = err
        unoccluded = err <= depth_tol
        if not unoccluded.any():
            return None, None, None, False
        coords = coords[unoccluded]
        labels = labels[unoccluded]
        crucial = crucial[unoccluded]
    is_valid = (crucial.sum() >= prompts.crucial_count) and (
        crucial.shape[0] >= prompts.valid_threshold
    )
    return coords.astype(np.int32), labels, crucial, bool(is_valid)
