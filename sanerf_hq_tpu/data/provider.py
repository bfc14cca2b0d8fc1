"""Scene loading for the four dataset families, host-side (numpy).

Reference semantics: nerf/provider.py:146-835.
  - '3dfront' / 'llff': transforms.json with fl_x/fl_y/cx/cy + frames
    (provider.py:167-270); ngp axis permutation then y/z column flips;
    center_poses; auto-scale
  - 'others': images_{k}/ + metadata.json (positions/quaternions) or pose/
    dir + intrinsic/intrinsic_color.txt (provider.py:273-337)
  - 'mip' / 'lerf': COLMAP binary sparse model (provider.py:339-444) with
    the convention rectification poses[:, :3, 1:3] *= -1; rows [1,0,2]
    permute; row-2 negation; sparse-point-based per-view near/far
  - splits: val_type default/val_all/val_split (provider.py:611-664)
  - object masks from {mask_root}/{img}_obj_mask.npy gated by
    valid_dict.json score>0.5, >=10 px, ::3 subsample min 25
    (provider.py:666-758)

Output is a plain `Scene` of numpy arrays ready to be device_put once
(the reference's --preload, forced on at main.py:219).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from .colmap import load_sparse_model, qvec2rotmat


@dataclasses.dataclass
class Scene:
    images: Optional[np.ndarray]  # [V, H, W, 3/4] float32 in [0,1] (None for test-only)
    poses: np.ndarray  # [V, 4, 4] cam2world, ngp convention
    intrinsics: np.ndarray  # [V, 4] (fx, fy, cx, cy)
    H: int
    W: int
    img_names: np.ndarray  # [V] str
    cam_near_far: Optional[np.ndarray] = None  # [V, 2]
    masks: Optional[np.ndarray] = None  # [V, H, W] int labels (-1 = unlabeled)
    pts_aabb: Optional[np.ndarray] = None  # [6]
    scale: float = 1.0
    transforms: Optional[dict] = None  # center/R used by center_poses
    pts3d: Optional[np.ndarray] = None  # [P, 3] sparse points (colmap)


def _normalize(v):
    return v / (np.linalg.norm(v) + 1e-10)


def rotmat_between(a, b):
    a, b = _normalize(np.asarray(a, np.float64)), _normalize(np.asarray(b, np.float64))
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-10:
        return rotmat_between(a + np.random.uniform(-1e-2, 1e-2, 3), b)
    s = np.linalg.norm(v)
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat @ kmat * ((1 - c) / (s ** 2 + 1e-10))


def center_poses(poses, pts3d=None, enable_cam_center=False):
    """Recenter on the camera/point cloud and align mean-up with +z
    (provider.py:67-103)."""
    if pts3d is None or enable_cam_center:
        center = poses[:, :3, 3].mean(0)
    else:
        center = pts3d.mean(0)
    up = _normalize(poses[:, :3, 1].mean(0))
    R = rotmat_between(up, [0, 0, 1])
    R4 = np.eye(4)
    R4[:3, :3] = R
    poses = poses.copy()
    poses[:, :3, 3] -= center
    poses_centered = (R4 @ poses).astype(np.float32)
    transforms = {"center": center, "R": R4}
    if pts3d is not None:
        pts3d_centered = (pts3d - center) @ R.T
        return poses_centered, pts3d_centered, transforms
    return poses_centered, None, transforms


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0, 0, 0)):
    """Axis permutation (y,z,x) with translation scale/offset
    (provider.py:45-53)."""
    return np.array([
        [pose[1, 0], pose[1, 1], pose[1, 2], pose[1, 3] * scale + offset[0]],
        [pose[2, 0], pose[2, 1], pose[2, 2], pose[2, 3] * scale + offset[1]],
        [pose[0, 0], pose[0, 1], pose[0, 2], pose[0, 3] * scale + offset[2]],
        [0, 0, 0, 1],
    ], dtype=np.float32)


def ngp_to_nerf_matrix(pose, scale, offset=(0, 0, 0)):
    """Inverse of nerf_matrix_to_ngp (provider.py:804-812)."""
    return np.array([
        [pose[2, 0], pose[2, 1], pose[2, 2], (pose[2, 3] - offset[2]) / scale],
        [pose[0, 0], pose[0, 1], pose[0, 2], (pose[0, 3] - offset[0]) / scale],
        [pose[1, 0], pose[1, 1], pose[1, 2], (pose[1, 3] - offset[1]) / scale],
        [0, 0, 0, 1],
    ], dtype=np.float32)


def _load_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    if img.shape[-1] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def _find_img_folder(root: str, downscale: int) -> str:
    folder = os.path.join(root, f"images_{downscale}")
    if not os.path.exists(folder):
        folder = os.path.join(root, "images")
    return folder


def load_scene(root_path: str, data_type: str = "mip", downscale: int = 1,
               scale: float = -1.0, offset=(0, 0, 0),
               enable_cam_center: bool = False, bound: float = 128.0,
               load_images: bool = True) -> Scene:
    if data_type in ("llff", "3dfront"):
        return _load_transforms_json(root_path, data_type, downscale, scale,
                                     offset, enable_cam_center, bound,
                                     load_images)
    if data_type == "others":
        return _load_others(root_path, downscale, scale, enable_cam_center,
                            bound, load_images)
    if data_type in ("mip", "lerf"):
        return _load_colmap(root_path, downscale, scale, enable_cam_center,
                            bound, load_images)
    raise NotImplementedError(f"Unsupported data type: {data_type}")


def _load_transforms_json(root, data_type, downscale, scale, offset,
                          enable_cam_center, bound, load_images):
    with open(os.path.join(root, "transforms.json")) as f:
        transform = json.load(f)
    H, W = int(transform["h"]), int(transform["w"])

    # 3D-FRONT: center offset from the ground-truth room bbox
    # (provider.py:171-176)
    if data_type == "3dfront" and "room_bbox" in transform:
        bbox = np.array(transform["room_bbox"])
        s = scale if scale != -1 else 1.0
        offset = tuple(-(bbox[0] + bbox[1]) * 0.5 * s)

    img_folder = _find_img_folder(root, downscale)
    img_paths, poses, intrinsics = [], [], []
    intr = np.array([transform["fl_x"], transform["fl_y"], transform["cx"],
                     transform["cy"]], dtype=np.float32)
    for frame in transform["frames"]:
        p = frame["file_path"]
        cand = os.path.join(root, p)
        if not os.path.exists(cand):
            cand = os.path.join(img_folder, os.path.basename(p))
        img_paths.append(cand)
        pose = nerf_matrix_to_ngp(
            np.array(frame["transform_matrix"], dtype=np.float32), scale=1
        )
        pose[:, 1:3] = -pose[:, 1:3]
        poses.append(pose)
        intrinsics.append(intr)
    poses = np.stack(poses)
    poses[:, :3, 1:3] *= -1  # camera looks at -z (provider.py:205,259)
    intrinsics = np.stack(intrinsics)

    if data_type == "llff":
        # reference multiplies intrinsics/H/W by downscale (provider.py:253-256)
        intrinsics = intrinsics * downscale
        H, W = H * downscale, W * downscale
        pts3d = poses[:, :3, 3]
        if scale == -1:
            scale = 0.33
        poses[:, :3, 3] *= scale
        transforms = None
    else:  # 3dfront
        pts3d = poses[:, :3, 3].copy()
        poses, pts3d, transforms = center_poses(poses, pts3d, enable_cam_center)
        if scale == -1:
            scale = 1 / max(np.linalg.norm(poses[:, :3, 3], axis=-1).max(), 1e-8)
        poses[:, :3, 3] *= scale
        pts3d = pts3d * scale

    pts_aabb = np.concatenate([pts3d.min(0), pts3d.max(0)])
    img_names = np.array([os.path.basename(p) for p in img_paths])
    images = _stack_images(img_paths, H, W) if load_images else None
    return Scene(images, poses.astype(np.float32), intrinsics, H, W,
                 img_names, None, None, pts_aabb, scale, transforms)


def _load_others(root, downscale, scale, enable_cam_center, bound, load_images):
    import cv2
    from pathlib import Path

    img_folder = _find_img_folder(root, downscale)
    img_names = sorted(os.listdir(img_folder))
    img_paths = [os.path.join(img_folder, n) for n in img_names]
    H, W = cv2.imread(img_paths[0]).shape[:2]

    poses, intrinsics = [], []
    meta_path = os.path.join(root, "metadata.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        K = np.array(meta["camera"]["K"])
        K[0] *= W
        K[1] *= H
        intr = np.abs(np.array([K[0, 0], K[1, 1], K[0, -1], K[1, -1]],
                               dtype=np.float32))
        for i in range(len(meta["camera"]["positions"])):
            pose = np.eye(4)
            t = np.array(meta["camera"]["positions"][i])
            q = np.array(meta["camera"]["quaternions"][i])  # (w, x, y, z)
            pose[:3, :3] = qvec2rotmat(q)
            pose[:3, 3] = t
            poses.append(pose)
            intrinsics.append(intr)
    else:
        pose_root = os.path.join(root, "pose")
        intri_file = os.path.join(root, "intrinsic", "intrinsic_color.txt")
        M = np.array([[float(y) for y in x.split()] for x in
                      Path(intri_file).read_text().splitlines() if x.strip()])
        intr = np.array([M[0, 0], M[1, 1], M[0, -2], M[1, -2]], dtype=np.float32)
        for name in img_names:
            pose = np.array([[float(y) for y in x.split()] for x in
                             Path(os.path.join(pose_root, name[:-3] + "txt"))
                             .read_text().splitlines() if x.strip()])
            pose[:, 1:3] = -pose[:, 1:3]
            poses.append(pose)
            intrinsics.append(intr)

    poses = np.stack(poses).astype(np.float64)
    pts3d = poses[:, :3, 3].copy()
    poses, pts3d, transforms = center_poses(poses, pts3d, enable_cam_center)
    if scale == -1:
        scale = 1 / max(np.linalg.norm(poses[:, :3, 3], axis=-1).max(), 1e-8)
    poses[:, :3, 3] *= scale
    pts_aabb = np.concatenate([poses[:, :3, 3].min(0), poses[:, :3, 3].max(0)])
    images = _stack_images(img_paths, H, W) if load_images else None
    return Scene(images, poses.astype(np.float32), np.stack(intrinsics), H, W,
                 np.array(img_names), None, None, pts_aabb, scale, transforms)


def _load_colmap(root, downscale, scale, enable_cam_center, bound, load_images):
    colmap_path = None
    for cand in ("colmap_sparse/0", "sparse/0", "colmap"):
        p = os.path.join(root, cand)
        if os.path.exists(p):
            colmap_path = p
            break
    if colmap_path is None:
        raise ValueError(f"Cannot find colmap sparse output under {root}")

    camdata, imdata, ptsdata = load_sparse_model(colmap_path)

    first_cam = camdata[sorted(camdata.keys())[0]]
    H = int(round(first_cam.height / downscale))
    W = int(round(first_cam.width / downscale))

    imkeys = np.array(sorted(imdata.keys()))
    img_names = np.array([os.path.basename(imdata[k].name) for k in imkeys])
    img_folder = _find_img_folder(root, downscale)
    img_paths = np.array([os.path.join(img_folder, n) for n in img_names])
    exist_mask = np.array([os.path.exists(f) for f in img_paths])
    imkeys = imkeys[exist_mask]
    img_names = img_names[exist_mask]
    img_paths = img_paths[exist_mask]

    intrinsics = []
    for k in imkeys:
        cam = camdata[imdata[k].camera_id]
        if cam.model in ("SIMPLE_RADIAL", "SIMPLE_PINHOLE"):
            fl_x = fl_y = cam.params[0] / downscale
            cx, cy = cam.params[1] / downscale, cam.params[2] / downscale
        elif cam.model in ("PINHOLE", "OPENCV"):
            fl_x, fl_y = cam.params[0] / downscale, cam.params[1] / downscale
            cx, cy = cam.params[2] / downscale, cam.params[3] / downscale
        else:
            raise ValueError(f"Unsupported colmap camera model: {cam.model}")
        intrinsics.append(np.array([fl_x, fl_y, cx, cy], dtype=np.float32))
    intrinsics = np.stack(intrinsics)

    poses = []
    for k in imkeys:
        P = np.eye(4, dtype=np.float64)
        P[:3, :3] = qvec2rotmat(imdata[k].qvec)
        P[:3, 3] = imdata[k].tvec
        poses.append(P)
    poses = np.linalg.inv(np.stack(poses))  # world2cam -> cam2world

    ptskeys = np.array(sorted(ptsdata.keys())) if ptsdata else np.array([], np.int64)
    pts3d = (np.array([ptsdata[k].xyz for k in ptskeys])
             if len(ptskeys) else poses[:, :3, 3].copy())

    poses, pts3d, transforms = center_poses(poses, pts3d, enable_cam_center)

    # convention rectification (provider.py:424-431)
    poses[:, :3, 1:3] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2] *= -1
    pts3d = pts3d[:, [1, 0, 2]]
    pts3d[:, 2] *= -1

    if scale == -1:
        scale = 1 / max(np.linalg.norm(poses[:, :3, 3], axis=-1).max(), 1e-8)
    poses[:, :3, 3] *= scale
    pts3d = pts3d * scale
    pts_aabb = np.concatenate([pts3d.min(0), pts3d.max(0)])

    # per-view near/far from visible sparse points (provider.py:464-502)
    cam_near_far = _sparse_depth_near_far(
        imdata, imkeys, ptsdata, ptskeys, poses, pts3d, camdata
    )

    images = _stack_images(list(img_paths), H, W) if load_images else None
    return Scene(images, poses.astype(np.float32), intrinsics, H, W,
                 img_names, cam_near_far, None, pts_aabb, scale, transforms,
                 pts3d=pts3d.astype(np.float32))


def _sparse_depth_near_far(imdata, imkeys, ptsdata, ptskeys, poses, pts3d,
                           camdata=None):
    """Per-view [near, far] from the depths of its visible sparse points,
    reference-parity semantics (provider.py:464-502):
      - keep only points with point3D_id != -1 whose keypoint xys falls
        inside the ORIGINAL-resolution image bounds,
      - depth = (cam_origin - point) . cam_z_axis on the rectified poses,
      - [near, far] = [min(depth), max(depth)] (the percentile variant is
        commented out in the reference).
    Views with no valid point fall back to [0.05, 1e3] (the reference
    asserts instead; a graceful fallback keeps partial scenes loadable)."""
    if not len(ptskeys):
        return None
    # map colmap point key -> dense array index (provider.py:467-469)
    key_to_id = np.full(int(ptskeys.max()) + 2, -1, dtype=np.int64)
    key_to_id[ptskeys] = np.arange(len(ptskeys))
    out = []
    for i, k in enumerate(imkeys):
        im = imdata[k]
        pids = np.asarray(im.point3D_ids)
        mask = pids != -1
        xys = np.asarray(im.xys, np.float64)
        if camdata is not None and xys.shape[0] == pids.shape[0]:
            cam = camdata[im.camera_id]
            # xys is (x, y) at original resolution (provider.py:472-478)
            mask &= ((xys[:, 0] >= 0) & (xys[:, 0] < cam.width)
                     & (xys[:, 1] >= 0) & (xys[:, 1] < cam.height))
        ids = key_to_id[np.clip(pids[mask], 0, len(key_to_id) - 1)]
        ids = ids[ids >= 0]
        if ids.size == 0:
            out.append(np.array([0.05, 1e3], np.float32))
            continue
        # depth = (P[:3,3] - pts) @ P[:3,2]  (provider.py:492)
        depth = (poses[i, :3, 3] - pts3d[ids]) @ poses[i, :3, 2]
        out.append(np.array([depth.min(), depth.max()], np.float32))
    return np.stack(out)


def _stack_images(paths, H, W):
    import cv2

    imgs = []
    for p in paths:
        img = _load_image(p)
        if img.shape[0] != H or img.shape[1] != W:
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        imgs.append(img)
    return np.stack(imgs)


# ---------------------------------------------------------------------------
# splits & masks
# ---------------------------------------------------------------------------

def split_indices(n_views: int, split: str, val_type: str = "default",
                  test_view_names=None, img_names=None,
                  auto_seg: bool = False):
    """Reference split logic (provider.py:611-664): val 'default' holds
    out every 16th view (all_ids[::16], provider.py:620-621) and train is
    everything else; 'val_all' puts every view in val (train empty);
    'val_split' selects val views whose image-name stem appears in the
    test-view list (provider.py:632) and falls back to ::16 when the list
    is unavailable (pass test_view_names=None).

    auto_seg overrides all of the above (provider.py:636-644): val = the
    first 100 views (hard-coded in the reference), train = ALL views.
    """
    all_idx = np.arange(n_views)
    if auto_seg:
        if split in ("train", "all", "trainval"):
            return all_idx
        return all_idx[:100]
    if val_type == "val_all":
        # reference provider.py:622-623,641-642: val_ids = ALL views and
        # train = [i not in val_ids] = EMPTY.  val_all is only meaningful
        # with stage-2 cache mode, which never runs the training loop.
        return all_idx if split != "train" else all_idx[:0]
    if val_type == "val_split" and test_view_names is not None and img_names is not None:
        # reference provider.py:632 matches image-name STEMS
        # (img_names[idx][:-4]) against the test-view list, so a
        # reference-format json ({"test_view_list": ["frame_0012", ...]})
        # must select views regardless of extension.  Compare stems on
        # BOTH sides so either convention works.
        test_set = {os.path.splitext(n)[0] for n in test_view_names}
        is_test = np.array(
            [os.path.splitext(str(n))[0] in test_set for n in img_names])
        if split in ("train", "all", "trainval"):
            return all_idx[~is_test]
        return all_idx[is_test]
    # default: hold out every 16th view for val (provider.py:620-621)
    if split in ("train",):
        return all_idx[all_idx % 16 != 0]
    if split in ("val", "test"):
        return all_idx[all_idx % 16 == 0]
    return all_idx  # 'all' / 'trainval'


def load_object_masks(mask_root: str, img_names, H: int, W: int,
                      valid_json: str = "valid_dict.json",
                      score_thresh: float = 0.5, min_pixels: int = 10,
                      subsample: bool = True, auto_seg: bool = False):
    """Load {img}_obj_mask.npy files with validity gating
    (provider.py:666-758): a view is valid when its valid_dict score > 0.5
    and the mask has >= 10 foreground pixels; valid training views are
    subsampled ::3 with a floor of 25 (provider.py:723-737).

    Returns (masks [V, H, W] int labels, valid_indices [K])."""
    import cv2

    valid_path = os.path.join(mask_root, valid_json)
    valid = {}
    if os.path.exists(valid_path):
        with open(valid_path) as f:
            valid = json.load(f)
    masks = np.zeros((len(img_names), H, W), dtype=np.int32)
    valid_idx = []
    for i, name in enumerate(img_names):
        stem = os.path.splitext(str(name))[0]
        p = os.path.join(mask_root, f"{stem}_obj_mask.npy")
        if not os.path.exists(p):
            continue
        m = np.load(p)
        if m.ndim == 3:
            # reference saves [1, H, W] (trainer.py:1770); legacy per-class
            # probability maps are argmaxed
            m = m[0] if m.shape[0] == 1 else (
                m.argmax(0) if m.shape[0] < m.shape[-1] else m.argmax(-1))
        if m.shape != (H, W):
            m = cv2.resize(m.astype(np.uint8), (W, H),
                           interpolation=cv2.INTER_NEAREST)
        masks[i] = m.astype(np.int32)
        score = float(valid.get(stem, 1))
        if auto_seg or ((m > 0).sum() >= min_pixels and score > score_thresh):
            valid_idx.append(i)
    valid_idx = np.asarray(valid_idx, np.int64)
    if subsample and not auto_seg and valid_idx.shape[0] > 25:
        sub = valid_idx[::3]
        if sub.shape[0] < 25:
            extra = np.random.choice(valid_idx, 25 - sub.shape[0])
            sub = np.concatenate([sub, extra])
        valid_idx = sub
    return masks, valid_idx
