#!/usr/bin/env python
"""Write the rich procedural benchmark scene to disk in real dataset
formats so the FULL CLI pipeline (stages 1-3) runs from files exactly as it
would on Mip-NeRF 360 / LLFF captures.

  python scripts/make_synth_scene.py <root> --format llff     # transforms.json
  python scripts/make_synth_scene.py <root> --format colmap   # sparse/0/*.bin
  (both also write GT object masks + decode-style {img}_obj_mask.npy)

The COLMAP export inverts the provider's convention rectification
(data/provider.py:306-312: GL->CV flip then qvec/tvec of world2cam) and
emits sparse 3-D points sampled from the true scene surfaces, so the
sparse-depth near/far path (provider.py:464-502 parity) sees realistic
geometry.
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sanerf_hq_tpu.data.synthetic import (  # noqa: E402
    make_clutter_dataset, make_rich_dataset, render_rich_scene)


def write_images(root, d):
    import cv2

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    names = []
    for i in range(d["images"].shape[0]):
        name = f"v{i:03d}.png"
        cv2.imwrite(os.path.join(root, "images", name),
                    cv2.cvtColor((d["images"][i] * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        names.append(name)
    return names


def write_masks(root, d, names, object_id: int = 2):
    """GT masks for stage-3/mIoU: full label maps under gt_masks/, plus
    decode-layout {img}_obj_mask.npy + valid_dict.json under masks/
    (binary: the chosen object), mirroring trainer.py:1761-1774 output."""
    gt_dir = os.path.join(root, "gt_masks")
    dec_dir = os.path.join(root, "masks")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(dec_dir, exist_ok=True)
    valid = {}
    for i, name in enumerate(names):
        stem = os.path.splitext(name)[0]
        np.save(os.path.join(gt_dir, stem + ".npy"), d["obj_ids"][i])
        binary = (d["obj_ids"][i] == object_id).astype(np.float32)
        np.save(os.path.join(dec_dir, f"{stem}_obj_mask.npy"), binary[None])
        valid[stem] = 1.0
    with open(os.path.join(dec_dir, "valid_dict.json"), "w") as f:
        json.dump(valid, f)


def export_llff(root, d, names):
    fx, fy, cx, cy = d["intrinsics"]
    frames = [{"file_path": f"images/{n}",
               "transform_matrix": d["poses"][i].tolist()}
              for i, n in enumerate(names)]
    meta = {"w": d["W"], "h": d["H"], "fl_x": float(fx), "fl_y": float(fy),
            "cx": float(cx), "cy": float(cy), "frames": frames}
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _surface_points(rng, n=400, scene="rich"):
    """Sparse points on the true scene surfaces (for points3D.bin)."""
    from sanerf_hq_tpu.data.synthetic import _CL_SPHERES, _PLANE_Y, _SPHERES

    spheres = _CL_SPHERES if scene == "clutter" else _SPHERES
    per = n // (len(spheres) + 1)
    pts = []
    for center, radius, _, _ in spheres:
        v = rng.normal(size=(per, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts.append(center + radius * v)
    g = rng.uniform(-2.5, 2.5, size=(n - len(spheres) * per, 3))
    g[:, 1] = _PLANE_Y
    pts.append(g)
    return np.concatenate(pts).astype(np.float64)


def export_colmap(root, d, names, scene="rich"):
    from sanerf_hq_tpu.data.colmap import rotmat2qvec

    rng = np.random.default_rng(0)
    pts = _surface_points(rng, scene=scene)
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    fx, fy, cx, cy = [float(x) for x in d["intrinsics"]]
    V = len(names)

    with open(os.path.join(sp, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, d["W"], d["H"]))  # PINHOLE
        f.write(struct.pack("<4d", fx, fy, cx, cy))

    # project points into each view for observations (xys at original res)
    per_view_obs = []
    for i in range(V):
        c2w = d["poses"][i].copy()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1  # GL -> CV
        w2c = np.linalg.inv(c2w)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / np.where(z > 1e-6, z, 1e-6) + cx
        v = fy * pc[:, 1] / np.where(z > 1e-6, z, 1e-6) + cy
        vis = (z > 0.05) & (u >= 0) & (u < d["W"]) & (v >= 0) & (v < d["H"])
        ids = np.nonzero(vis)[0]
        per_view_obs.append((w2c, ids, u[ids], v[ids]))

    with open(os.path.join(sp, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", V))
        for i, name in enumerate(names):
            w2c, ids, us, vs = per_view_obs[i]
            q = rotmat2qvec(w2c[:3, :3])
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *w2c[:3, 3]))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(ids)))
            for j in range(len(ids)):
                f.write(struct.pack("<ddq", us[j], vs[j], int(ids[j]) + 1))

    with open(os.path.join(sp, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", 128, 128, 128))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--format", choices=["llff", "colmap"], default="llff")
    ap.add_argument("--scene", choices=["rich", "clutter"], default="rich",
                    help="rich: 4-object benchmark; clutter: the harder "
                         "7-object high-frequency scene with extrapolated "
                         "val views (writes test_views.json for "
                         "--val_type val_split)")
    ap.add_argument("--n_views", type=int, default=24)
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--object_id", type=int, default=2,
                    help="object for the decode-style binary masks")
    args = ap.parse_args()

    if args.scene == "clutter":
        d = make_clutter_dataset(n_views=args.n_views, H=args.H, W=args.W)
    else:
        d = make_rich_dataset(n_views=args.n_views, H=args.H, W=args.W)
    os.makedirs(args.root, exist_ok=True)
    names = write_images(args.root, d)
    write_masks(args.root, d, names, object_id=args.object_id)
    if "val_names" in d:
        # reference-format stems list (provider.py:632 semantics): the
        # extrapolated views become the held-out val set via
        # --val_type val_split --test_view_path <root>/test_views.json
        with open(os.path.join(args.root, "test_views.json"), "w") as f:
            json.dump({"test_view_list": d["val_names"]}, f)
    # 3-D point prompts on the default object's surface (sphere 0:
    # center (0,-0.1,0) r=0.5) — decode-stage input, schema of
    # example_points.json / utils/points.py:24-38.  The reference's point
    # files come from GUI clicks in the PROVIDER frame, so emit the
    # prompts through the same nerf->ngp transform the pose loader
    # applies (data/provider.py:83-91; llff default scale 0.33).
    ngp_scale = 0.33
    # The crucial point sits 0.02 BELOW the sphere's north pole: the exact
    # pole is on the silhouette from the low camera ring, so its
    # floor-cast pixel (reference .long() cast, nerf/trainer.py:943) lands
    # half a pixel OFF the object and the |z - depth| <= 0.05 occlusion
    # gate rejects it from every low view.  Sunk 0.02 into the sphere the
    # projected pixel is >=2 px interior in all 24 views with worst
    # depth-gate residual 0.036 (GT) / 0.036 (trained-NeRF), measured.
    if args.scene == "clutter":
        # object 2 = sphere center (0,-0.05,0) r=0.45 (_CL_SPHERES[0]);
        # same pole-sunk + interior-side layout as the rich prompts
        side = (0.45 - 0.02) / np.sqrt(2.0)
        raw = np.array([[0.0, 0.38, 0.0], [side, -0.05, side],
                        [-side, -0.05, -side]], np.float32)
    else:
        raw = np.array([[0.0, 0.38, 0.0], [0.35, -0.1, 0.35],
                        [-0.35, -0.1, -0.35]], np.float32)
    pts_ngp = raw[:, [1, 2, 0]] * ngp_scale
    with open(os.path.join(args.root, "example_points.json"), "w") as f:
        json.dump({"points": pts_ngp.tolist(),
                   "crucial_point_index": [0],
                   "valid_threshold": 1}, f)
    if args.format == "llff":
        export_llff(args.root, d, names)
    else:
        export_colmap(args.root, d, names, scene=args.scene)
    print(f"wrote {len(names)} views to {args.root} ({args.format})")


if __name__ == "__main__":
    main()
