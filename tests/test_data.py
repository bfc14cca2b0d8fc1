"""Data-layer tests: COLMAP readers (python vs native C++), pose pipeline,
ray generation conventions, samplers, trajectory synthesis."""
import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sanerf_hq_tpu.data.colmap import (
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    qvec2rotmat,
    rotmat2qvec,
)
from sanerf_hq_tpu.data.provider import (
    center_poses,
    nerf_matrix_to_ngp,
    ngp_to_nerf_matrix,
    split_indices,
)
from sanerf_hq_tpu.data.rays import full_frame_rays, rays_from_pixels
from sanerf_hq_tpu.data.synthetic import look_at_pose
from sanerf_hq_tpu.data.trajectory import circle_poses, interpolate_poses


# ---------------------------------------------------------------------------
# synthetic COLMAP binary model writer (independent of both readers)
# ---------------------------------------------------------------------------

def write_colmap_model(d):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    # cameras.bin: 2 cameras (PINHOLE=1: 4 params; SIMPLE_RADIAL=2: 4 params)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        f.write(struct.pack("<iiQQ", 2, 2, 640, 480))
        f.write(struct.pack("<4d", 450.0, 320.0, 240.0, 0.01))
    # images.bin: 3 images
    qs, ts, names, p2ds = [], [], [], []
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            qs.append(q)
            ts.append(t)
            name = f"img_{i:03d}.jpg"
            names.append(name)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1 + i % 2))
            f.write(name.encode() + b"\x00")
            n2d = 2 + i
            p2d = rng.uniform(0, 640, size=(n2d, 2))
            ids = rng.integers(1, 5, size=n2d)
            p2ds.append((p2d, ids))
            f.write(struct.pack("<Q", n2d))
            for (x, y), pid in zip(p2d, ids):
                f.write(struct.pack("<ddq", x, y, int(pid)))
    # points3D.bin: 4 points
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 4))
        for i in range(4):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 1, 0))
            f.write(struct.pack("<ii", 2, 1))
    return qs, ts, names, p2ds


def test_colmap_python_reader(tmp_path):
    d = str(tmp_path / "sparse")
    qs, ts, names, p2ds = write_colmap_model(d)
    cams = read_cameras_binary(os.path.join(d, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])
    imgs = read_images_binary(os.path.join(d, "images.bin"))
    assert len(imgs) == 3
    for i in range(3):
        np.testing.assert_allclose(imgs[i + 1].qvec, qs[i])
        np.testing.assert_allclose(imgs[i + 1].tvec, ts[i])
        assert imgs[i + 1].name == names[i]
        np.testing.assert_allclose(imgs[i + 1].xys, p2ds[i][0])
        np.testing.assert_array_equal(imgs[i + 1].point3D_ids, p2ds[i][1])
    pts = read_points3d_binary(os.path.join(d, "points3D.bin"))
    assert len(pts) == 4
    np.testing.assert_array_equal(pts[1].image_ids, [1, 2])


def test_colmap_native_matches_python(tmp_path):
    from sanerf_hq_tpu.data import colmap_native as cn

    if not cn.native_available():
        pytest.skip("native reader not built (no compiler)")
    d = str(tmp_path / "sparse")
    write_colmap_model(d)
    cams_p = read_cameras_binary(os.path.join(d, "cameras.bin"))
    cams_n = cn.read_cameras_native(os.path.join(d, "cameras.bin"))
    assert set(cams_p) == set(cams_n)
    for k in cams_p:
        assert cams_p[k].model == cams_n[k].model
        np.testing.assert_allclose(cams_p[k].params, cams_n[k].params)
    imgs_p = read_images_binary(os.path.join(d, "images.bin"))
    imgs_n = cn.read_images_native(os.path.join(d, "images.bin"))
    for k in imgs_p:
        np.testing.assert_allclose(imgs_p[k].qvec, imgs_n[k].qvec)
        np.testing.assert_allclose(imgs_p[k].xys, imgs_n[k].xys)
        assert imgs_p[k].name == imgs_n[k].name
        np.testing.assert_array_equal(imgs_p[k].point3D_ids,
                                      imgs_n[k].point3D_ids)
    pts_p = read_points3d_binary(os.path.join(d, "points3D.bin"))
    pts_n = cn.read_points3d_native(os.path.join(d, "points3D.bin"))
    for k in pts_p:
        np.testing.assert_allclose(pts_p[k].xyz, pts_n[k].xyz)
        np.testing.assert_array_equal(pts_p[k].image_ids, pts_n[k].image_ids)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_ngp_matrix_roundtrip():
    rng = np.random.default_rng(2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = qvec2rotmat(rng.normal(size=4) / 2)
    pose[:3, 3] = rng.normal(size=3)
    ngp = nerf_matrix_to_ngp(pose, scale=0.5, offset=(0.1, 0.2, 0.3))
    back = ngp_to_nerf_matrix(ngp, scale=0.5, offset=(0.1, 0.2, 0.3))
    np.testing.assert_allclose(back, pose, atol=1e-5)


def test_center_poses_alignment():
    rng = np.random.default_rng(3)
    poses = np.stack([
        look_at_pose(rng.normal(size=3) * 3 + [0, 5, 0]) for _ in range(8)
    ]).astype(np.float64)
    centered, _, tf = center_poses(poses.copy(), None, enable_cam_center=True)
    # camera centroid at origin
    np.testing.assert_allclose(centered[:, :3, 3].mean(0), 0, atol=1e-5)
    # mean up direction aligned with +z
    up = centered[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)


def test_ray_conventions():
    """Center pixel looks along camera -z; depth convention unnormalized."""
    pose = jnp.asarray(look_at_pose([0, 0, 2]))
    intr = jnp.asarray([100.0, 100.0, 32.0, 32.0])
    ro, rd = full_frame_rays(pose, intr, 64, 64)
    ro, rd = np.asarray(ro), np.asarray(rd)
    np.testing.assert_allclose(ro[0], [0, 0, 2], atol=1e-6)
    center = rd.reshape(64, 64, 3)[32, 32]
    # pixel center (32.5, 32.5) -> slight offset; pixel (31..32) straddles cx
    d = center / np.linalg.norm(center)
    assert d[2] < -0.99  # looking toward -z (scene center)
    # unnormalized z-component magnitude is 1 in camera space -> depth =
    # z-distance (nerf/utils.py:272-277)
    cam_d = np.asarray(pose[:3, :3]).T @ center
    np.testing.assert_allclose(cam_d[2], -1.0, atol=1e-6)


def test_split_indices():
    idx = split_indices(32, "train")
    val = split_indices(32, "val")
    assert set(idx) | set(val) == set(range(32))
    assert set(idx) & set(val) == set()
    assert list(val) == [0, 16]  # every 16th (provider.py:620-621)
    names = np.array([f"i{i}.png" for i in range(6)])
    # reference-format test-view list: STEMS without extension
    # (provider.py:632 compares img_names[idx][:-4] to the list) — a
    # stems json must select the right val views and exclude them from
    # train, not silently match zero views
    tr = split_indices(6, "train", "val_split", ["i2", "i4"], names)
    te = split_indices(6, "val", "val_split", ["i2", "i4"], names)
    assert list(te) == [2, 4]
    assert 2 not in tr and 4 not in tr
    # extension-qualified entries keep working (stems compared both sides)
    te2 = split_indices(6, "val", "val_split", ["i2.png", "i4.png"], names)
    assert list(te2) == [2, 4]
    # val_all: every view is val and train is EMPTY (provider.py:622,641-642)
    assert list(split_indices(6, "val", "val_all")) == list(range(6))
    assert len(split_indices(6, "train", "val_all")) == 0


def test_sample_rgb_batch_per_view_intrinsics():
    """Stage-1 training must use EACH view's own intrinsics and
    sparse-depth near/far, not view 0's (reference collate carries both
    per selected view: nerf/provider.py:918, :1060-1063).  Discriminates
    against the old collapse-to-intrinsics[0] behavior."""
    from sanerf_hq_tpu.data.sampler import sample_rgb_batch

    rng = np.random.default_rng(0)
    V, H, W, n = 2, 8, 8, 256
    images = jnp.asarray(rng.uniform(size=(V, H, W, 3)), jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(4)] * V), jnp.float32)
    # two very different focal lengths
    intr = jnp.asarray([[100.0, 100.0, 4.0, 4.0],
                        [10.0, 10.0, 4.0, 4.0]], jnp.float32)
    cnf = jnp.asarray([[0.5, 2.0], [3.0, 9.0]], jnp.float32)
    batch = sample_rgb_batch(jax.random.PRNGKey(0), images, poses, intr, n,
                             cam_near_far=cnf)
    ii = np.asarray(batch["img_inds"])
    assert 0 < ii.sum() < n  # both views sampled
    # recompute rays per-ray with the CORRECT view's intrinsics
    pix = np.asarray(batch["pix_inds"])
    x = (pix % W).astype(np.float32) + 0.5
    y = (pix // W).astype(np.float32) + 0.5
    ro, rd = rays_from_pixels(poses[ii], intr[ii], jnp.asarray(x),
                              jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(batch["rays_d"]), np.asarray(rd),
                               rtol=1e-6)
    # a view-1 ray must NOT match what view-0 intrinsics would produce
    j = int(np.argmax(ii == 1))
    _, rd0 = rays_from_pixels(poses[:1].repeat(n, 0), intr[0],
                              jnp.asarray(x), jnp.asarray(y))
    assert not np.allclose(np.asarray(batch["rays_d"])[j],
                           np.asarray(rd0)[j])
    # per-ray near/far follow the sampled view
    np.testing.assert_allclose(np.asarray(batch["cam_near_far"]),
                               np.asarray(cnf)[ii])


def test_enable_cam_near_far_changes_training_bounds():
    """--enable_cam_near_far must tighten the TRAINING rays' near/far
    (nerf/renderer.py:231-234), i.e. the rendered depth of an empty field
    changes when per-view bounds are supplied."""
    from sanerf_hq_tpu.ops.ray import near_far_from_aabb

    ro = jnp.asarray([[0.0, 0.0, 5.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    aabb = jnp.asarray([-2, -2, -2, 2, 2, 2], jnp.float32)
    n0, f0 = near_far_from_aabb(ro, rd, aabb, min_near=0.05)
    cnf = jnp.asarray([[4.2, 6.0]])
    n1 = jnp.maximum(n0.reshape(-1, 1), cnf[:, :1])
    f1 = jnp.minimum(f0.reshape(-1, 1), cnf[:, 1:2])
    assert float(n1[0, 0]) > float(n0.reshape(-1)[0])
    assert float(f1[0, 0]) < float(f0.reshape(-1)[0])
    # and the full train step accepts the batch key end-to-end
    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import make_synthetic_dataset
    from sanerf_hq_tpu.data.sampler import sample_rgb_batch
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import create_train_state
    from sanerf_hq_tpu.train.steps import make_rgb_train_step

    cfg = Config(num_steps=(8, 4, 2), num_rays=32, iters=10, bound=4.0,
                 min_near=0.05, enable_cam_near_far=True)
    model = make_field("mlp", grid_bound=cfg.grid_bound, cp_rank=0,
                       hidden=16, num_layers=2, prop_hidden=8, prop_layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    state = create_train_state(params, cfg.lr, cfg.iters)
    step = make_rgb_train_step(model, cfg, donate=False)
    s = make_synthetic_dataset(n_views=2, H=8, W=8)
    cnf = jnp.asarray([[0.5, 2.0], [3.0, 9.0]], jnp.float32)
    batch = sample_rgb_batch(jax.random.PRNGKey(1),
                             jnp.asarray(s["images"]),
                             jnp.asarray(s["poses"]),
                             jnp.asarray(s["intrinsics"]), cfg.num_rays,
                             cam_near_far=cnf)
    batch["step"] = state.step
    _, m1 = step(state, batch, jax.random.PRNGKey(2))
    batch2 = {k: v for k, v in batch.items() if k != "cam_near_far"}
    _, m2 = step(state, batch2, jax.random.PRNGKey(2))
    # tighter bounds change the sample placement, hence the loss
    assert float(m1["loss"]) != float(m2["loss"])


def test_split_indices_auto_seg():
    """auto_seg overrides the split (provider.py:636-644): val = the
    first 100 views, train = ALL views."""
    tr = split_indices(120, "train", auto_seg=True)
    va = split_indices(120, "val", auto_seg=True)
    assert list(tr) == list(range(120))
    assert list(va) == list(range(100))
    # auto_seg wins over val_split too (the reference assignment comes last)
    names = np.array([f"i{i}.png" for i in range(120)])
    tr2 = split_indices(120, "train", "val_split", ["i2.png"], names,
                        auto_seg=True)
    assert list(tr2) == list(range(120))


def test_visualize_poses_writes_ply(tmp_path):
    """--vis_pose artifact (provider.py:105-140 headless equivalent):
    PLY with per-camera 9 segments + bound box (+ unit box when
    bound > 1) and the point cloud."""
    from sanerf_hq_tpu.utils.vis_pose import visualize_poses

    poses = np.stack([np.eye(4)] * 3)
    pts = np.random.default_rng(0).normal(size=(17, 3))
    out = visualize_poses(poses, bound=4.0, points=pts,
                          out_path=str(tmp_path / "poses.ply"))
    txt = open(out).read()
    n_edges = 12 + 12 + 3 * 9  # bound box + unit box + 3 cameras
    assert f"element edge {n_edges}" in txt
    assert f"element vertex {n_edges * 2 + 17}" in txt


def test_trajectory_synthesis():
    poses = circle_poses(radius=2.0, n_frames=8)
    assert poses.shape == (8, 4, 4)
    # orbit stays at radius ~2 (plus elevation)
    r = np.linalg.norm(poses[:, :3, 3] - [0, 0.3, 0], axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-5)
    interp = interpolate_poses(poses[:3], num_frames=4)
    assert interp.shape == (10, 4, 4)
    for p in interp:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-5)


def test_load_scene_colmap_mip(tmp_path):
    """Full mip/COLMAP provider path: binary sparse model + images ->
    Scene with centered/scaled poses and sparse-depth near/far."""
    import struct
    import cv2
    from sanerf_hq_tpu.data.colmap import rotmat2qvec
    from sanerf_hq_tpu.data.provider import load_scene
    from sanerf_hq_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "scene")
    os.makedirs(root + "/images", exist_ok=True)
    os.makedirs(root + "/sparse/0", exist_ok=True)
    s = make_synthetic_dataset(n_views=6, H=32, W=32)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)) * 0.4

    with open(root + "/sparse/0/cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 32, 32))
        fx, fy, cx, cy = s["intrinsics"]
        f.write(struct.pack("<4d", fx, fy, cx, cy))
    with open(root + "/sparse/0/images.bin", "wb") as f:
        f.write(struct.pack("<Q", 6))
        for i in range(6):
            c2w = s["poses"][i].copy()
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1  # GL -> CV convention
            w2c = np.linalg.inv(c2w)
            q = rotmat2qvec(w2c[:3, :3])
            name = f"v{i:02d}.png"
            cv2.imwrite(os.path.join(root, "images", name),
                        (s["images"][i] * 255).astype(np.uint8))
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *w2c[:3, 3]))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            ids = rng.integers(1, 51, size=10)
            f.write(struct.pack("<Q", 10))
            for pid in ids:
                f.write(struct.pack("<ddq", 16.0, 16.0, int(pid)))
    with open(root + "/sparse/0/points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 50))
        for i in range(50):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *pts[i]))
            f.write(struct.pack("<3B", 1, 2, 3))
            f.write(struct.pack("<d", 0.3))
            f.write(struct.pack("<Q", 0))

    scene = load_scene(root, data_type="mip", enable_cam_center=True)
    assert scene.poses.shape == (6, 4, 4)
    assert scene.images.shape == (6, 32, 32, 3)
    assert scene.intrinsics.shape == (6, 4)
    assert scene.cam_near_far is not None and scene.cam_near_far.shape == (6, 2)
    assert np.all(scene.cam_near_far[:, 0] < scene.cam_near_far[:, 1])
    # poses remain orthonormal after convention rectification
    for p in scene.poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-4)
    # auto-scale puts the camera rig inside the unit-ish ball
    assert np.linalg.norm(scene.poses[:, :3, 3], axis=-1).max() <= 1.0 + 1e-5


def test_recorded_trajectory_replay(tmp_path):
    import json
    from sanerf_hq_tpu.data.trajectory import load_recorded_trajectories

    root = str(tmp_path / "traj")
    os.makedirs(root)
    poses = [look_at_pose([2, 0.3, 0]), look_at_pose([0, 0.3, 2]),
             look_at_pose([-2, 0.3, 0])]
    with open(os.path.join(root, "t0.json"), "w") as f:
        json.dump({"trajectory": [[p.tolist()] for p in poses]}, f)
    out_poses, intr, names = load_recorded_trajectories(root, interp_frames=4)
    assert out_poses.shape[0] == 10  # (3-1 segments) * (4+1 frames)
    assert names[0] == "0000_0000"
    for p in out_poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-4)


def test_sparse_depth_near_far_parity():
    """Reference-parity semantics (provider.py:464-502): xys out-of-bounds
    keypoints are excluded, near/far = min/max of visible-point depths
    along the camera z column (no percentiles, no margins)."""
    from sanerf_hq_tpu.data.colmap import Camera, Image
    from sanerf_hq_tpu.data.provider import _sparse_depth_near_far

    cam = Camera(1, "PINHOLE", width=100, height=80, params=[50, 50, 50, 40])
    # identity pose at origin; depth of a point = (0 - p) . z_axis = -p_z
    pose = np.eye(4, dtype=np.float64)
    pts3d = np.array([[0, 0, -2.0], [0, 0, -5.0], [0, 0, -9.0],
                      [0, 0, -50.0]])
    ptskeys = np.array([10, 11, 12, 13], np.int64)
    # keypoint 3 (depth 50) is OUT of image bounds -> must be excluded;
    # one id is -1 -> excluded
    xys = np.array([[10.0, 10.0], [20.0, 20.0], [99.0, 79.0], [150.0, 10.0],
                    [5.0, 5.0]])
    p3d = np.array([10, 11, 12, 13, -1], np.int64)
    im = Image(1, np.array([1, 0, 0, 0.0]), np.zeros(3), 1, "a.png", xys, p3d)
    ptsdata = {k: None for k in ptskeys}
    nf = _sparse_depth_near_far({1: im}, [1], ptsdata, ptskeys,
                                pose[None], pts3d, {1: cam})
    np.testing.assert_allclose(nf[0], [2.0, 9.0], rtol=1e-6)


def test_lowres_feature_camera_nonsquare():
    """SAM-aligned low-res feature camera for W != H views (VERDICT r4
    #4): the aspect-preserving fh x fw render must look along exactly the
    same rays as the full-res camera at positions (u*W/fw, v*H/fh) — the
    layout of a SAM encoder feature map with its bottom/right padding
    stripped (predictor set_image resize-longest-side convention)."""
    import jax.numpy as jnp

    from sanerf_hq_tpu.data.rays import full_frame_rays, rays_from_pixels
    from sanerf_hq_tpu.train.stages import lowres_feature_camera

    H, W = 48, 96
    intr = np.array([80.0, 70.0, 50.0, 22.0], np.float32)
    f_intr, fh, fw = lowres_feature_camera(intr, H, W, grid=16)
    assert (fh, fw) == (8, 16)  # long side -> grid, aspect preserved
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.3, -0.2, 1.0]
    ro, rd = full_frame_rays(jnp.asarray(pose), jnp.asarray(f_intr), fh, fw)
    jj, ii = np.meshgrid(np.arange(fw), np.arange(fh))
    x_full = (jj.reshape(-1) + 0.5) * (W / fw)
    y_full = (ii.reshape(-1) + 0.5) * (H / fh)
    ro2, rd2 = rays_from_pixels(
        jnp.asarray(pose), jnp.asarray(intr),
        jnp.asarray(x_full, jnp.float32), jnp.asarray(y_full, jnp.float32))
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ro), np.asarray(ro2), atol=1e-6)
    # square views keep the old behavior: 64 x 64 at uniform scale
    sq_intr, sh, sw = lowres_feature_camera(
        np.array([100.0, 100.0, 64.0, 64.0], np.float32), 128, 128)
    assert (sh, sw) == (64, 64)
    np.testing.assert_allclose(sq_intr, [50.0, 50.0, 32.0, 32.0])
