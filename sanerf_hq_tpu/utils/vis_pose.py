"""Camera-pose debugging visualization (--vis_pose).

Reference: nerf/provider.py:761 -> visualize_poses (provider.py:105-140),
which opens an interactive trimesh window drawing, per camera, 8 frustum
line segments plus a long look-direction segment, the [-bound, bound] box
(and the unit box when bound > 1), and the sparse point cloud.

This environment is headless, so the same geometry is written to disk
instead of shown: an ASCII PLY with vertex + edge elements (loadable by
MeshLab/trimesh/Open3D) and, when matplotlib is importable, a PNG 3-D
plot for quick eyeballing.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _camera_segments(pose: np.ndarray, size: float = 0.05) -> np.ndarray:
    """The reference's 9 line segments for one camera (provider.py:121-132):
    4 frustum edges from the origin, the 4 far-plane edges, and a 3-unit
    look-direction ray.  Returns [9, 2, 3]."""
    pos = pose[:3, 3]
    a = pos + size * pose[:3, 0] + size * pose[:3, 1] - size * pose[:3, 2]
    b = pos - size * pose[:3, 0] + size * pose[:3, 1] - size * pose[:3, 2]
    c = pos - size * pose[:3, 0] - size * pose[:3, 1] - size * pose[:3, 2]
    d = pos + size * pose[:3, 0] - size * pose[:3, 1] - size * pose[:3, 2]
    direction = (a + b + c + d) / 4 - pos
    direction = direction / (np.linalg.norm(direction) + 1e-8)
    o = pos + direction * 3
    return np.array([[pos, a], [pos, b], [pos, c], [pos, d],
                     [a, b], [b, c], [c, d], [d, a], [pos, o]])


def _box_segments(half: float) -> np.ndarray:
    """12 edges of the cube [-half, half]^3."""
    corners = np.array([[sx * half, sy * half, sz * half]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    edges = []
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(corners[i] != corners[j]) == 1:  # axis-aligned edge
                edges.append([corners[i], corners[j]])
    return np.array(edges)


def visualize_poses(poses: np.ndarray, bound: float = 1.0,
                    points: Optional[np.ndarray] = None,
                    out_path: str = "poses.ply", size: float = 0.05) -> str:
    """Write the pose/bound/point-cloud visualization to `out_path` (PLY)
    and `<out_path>.png` when matplotlib is available.  Returns the PLY
    path."""
    segs = [_box_segments(bound)]
    if bound > 1:
        segs.append(_box_segments(1.0))  # unit box (provider.py:116-118)
    for pose in np.asarray(poses):
        segs.append(_camera_segments(np.asarray(pose, np.float64), size))
    segs = np.concatenate(segs, axis=0)  # [E, 2, 3]

    verts = segs.reshape(-1, 3)
    edges = np.arange(len(verts)).reshape(-1, 2)
    pts = np.asarray(points).reshape(-1, 3) if points is not None else \
        np.zeros((0, 3))

    with open(out_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts) + len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\n")
        f.write(f"element edge {len(edges)}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} 255 64 64\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 64 64 255\n")
        for e in edges:
            f.write(f"{e[0]} {e[1]}\n")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        for s in segs:
            ax.plot(s[:, 0], s[:, 1], s[:, 2], "r-", lw=0.5)
        if len(pts):
            sub = pts[:: max(1, len(pts) // 5000)]
            ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.5, alpha=0.3)
        ax.set_title(f"{len(poses)} camera poses, bound={bound}")
        fig.savefig(out_path + ".png", dpi=120)
        plt.close(fig)
    except Exception:
        pass  # PLY is the artifact of record; the PNG is best-effort
    return out_path
