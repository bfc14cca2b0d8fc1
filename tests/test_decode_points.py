"""Decode point-projection and occlusion gating at the REFERENCE tolerance.

The reference rejects prompts whose camera-space z-depth differs from the
rendered depth by more than 0.05 (nerf/trainer.py:946-964).  These tests
drive project_points_to_view with ANALYTIC depth from the synthetic sphere
so the gate is exercised at exactly depth_tol=0.05 with no fit noise:
a front-surface point must be accepted, the antipodal (occluded) point
must be rejected, and the validity gate must count crucial points.
"""
import numpy as np

from sanerf_hq_tpu.data.synthetic import make_synthetic_dataset
from sanerf_hq_tpu.utils.points import PointPrompts, project_points_to_view


def _analytic_depth(pose, intrinsics, H, W, radius=0.5):
    """Z-distance map of the GT sphere (camera looks along -z; depth is
    -z_cam of the first hit, inf on background)."""
    fx, fy, cx, cy = intrinsics
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xs = (xx + 0.5 - cx) / fx
    ys = -(yy + 0.5 - cy) / fy
    zs = -np.ones_like(xs)
    dirs = np.stack([xs, ys, zs], -1) @ pose[:3, :3].T
    o = pose[:3, 3]
    # unnormalized dirs with |z_cam| = 1 -> t IS the z-distance
    b = 2 * np.sum(dirs * o, -1)
    a = np.sum(dirs * dirs, -1)
    c = np.sum(o * o) - radius * radius
    disc = b * b - 4 * a * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), np.inf)
    return np.where(hit & (t > 0), t, np.inf).astype(np.float32)


def _setup(H=64, W=64):
    s = make_synthetic_dataset(n_views=4, H=H, W=W)
    pose = s["poses"][0]
    intr = s["intrinsics"]
    depth = _analytic_depth(pose, intr, H, W)
    eye = pose[:3, 3]
    front = (0.5 * eye / np.linalg.norm(eye)).astype(np.float32)
    return s, pose, intr, depth, front


def test_front_surface_point_accepted_at_reference_tol():
    s, pose, intr, depth, front = _setup()
    prompts = PointPrompts(points=front[None], labels=np.array([1], np.int32),
                           crucial_label=np.ones(1, np.int32),
                           crucial_count=1, valid_threshold=1)
    coords, labels, crucial, ok = project_points_to_view(
        prompts, pose, intr, s["H"], s["W"], pred_depth=depth,
        depth_tol=0.05)
    assert ok, "front surface point must pass the 0.05 depth gate"
    assert coords.shape == (1, 2)
    # it projects to the image center region (sphere faces the camera)
    assert abs(coords[0, 0] - s["W"] / 2) < 4
    assert abs(coords[0, 1] - s["H"] / 2) < 4


def test_occluded_point_rejected_at_reference_tol():
    """The antipodal surface point is 2r = 1.0 behind the visible surface —
    must be rejected at 0.05 (and would still be at 0.5)."""
    s, pose, intr, depth, front = _setup()
    prompts = PointPrompts(points=(-front)[None],
                           labels=np.array([1], np.int32),
                           crucial_label=np.ones(1, np.int32),
                           crucial_count=1, valid_threshold=1)
    coords, labels, crucial, ok = project_points_to_view(
        prompts, pose, intr, s["H"], s["W"], pred_depth=depth,
        depth_tol=0.05)
    assert coords is None and not ok, "occluded point must be rejected"


def test_validity_gate_counts_crucial_points():
    """valid requires BOTH crucial_count crucial survivors AND
    valid_threshold total survivors (nerf/trainer.py:969-971)."""
    s, pose, intr, depth, front = _setup()
    pts = np.stack([front, -front])  # one visible, one occluded
    prompts = PointPrompts(points=pts,
                           labels=np.array([1, 1], np.int32),
                           crucial_label=np.array([0, 1], np.int32),
                           crucial_count=1, valid_threshold=1)
    coords, labels, crucial, ok = project_points_to_view(
        prompts, pose, intr, s["H"], s["W"], pred_depth=depth,
        depth_tol=0.05)
    # the only crucial point is occluded -> view invalid even though one
    # point survived
    assert coords is not None and coords.shape[0] == 1
    assert not ok

    prompts2 = PointPrompts(points=pts,
                            labels=np.array([1, 1], np.int32),
                            crucial_label=np.array([1, 0], np.int32),
                            crucial_count=1, valid_threshold=1)
    _, _, _, ok2 = project_points_to_view(
        prompts2, pose, intr, s["H"], s["W"], pred_depth=depth,
        depth_tol=0.05)
    assert ok2


def test_behind_camera_point_rejected():
    s, pose, intr, depth, front = _setup()
    eye = pose[:3, 3]
    behind = (eye + (eye / np.linalg.norm(eye))).astype(np.float32)
    prompts = PointPrompts(points=behind[None],
                           labels=np.array([1], np.int32),
                           crucial_label=np.ones(1, np.int32),
                           crucial_count=1, valid_threshold=1)
    coords, _, _, ok = project_points_to_view(
        prompts, pose, intr, s["H"], s["W"], pred_depth=depth,
        depth_tol=0.05)
    assert not ok
