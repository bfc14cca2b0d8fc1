#!/usr/bin/env python
"""COLMAP sparse model (or raw video/images) -> transforms.json.

Functional counterpart of the reference's scripts/colmap2nerf.py (instant-ngp
lineage): optionally extracts frames from a video (ffmpeg) and runs COLMAP
(if installed), then converts the sparse model into transforms.json with
centered, rescaled cam2world matrices.
"""
import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sanerf_hq_tpu.data.colmap import load_sparse_model, qvec2rotmat  # noqa: E402


def run_ffmpeg(video, out_dir, fps):
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run([
        "ffmpeg", "-i", video, "-qscale:v", "1", "-qmin", "1",
        "-vf", f"fps={fps}", os.path.join(out_dir, "%04d.jpg"),
    ], check=True)


def run_colmap(images, workspace):
    db = os.path.join(workspace, "database.db")
    sparse = os.path.join(workspace, "sparse")
    os.makedirs(sparse, exist_ok=True)
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", images], check=True)
    subprocess.run(["colmap", "exhaustive_matcher", "--database_path", db],
                   check=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", images, "--output_path", sparse],
                   check=True)
    return os.path.join(sparse, "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None)
    ap.add_argument("--images", default="images")
    ap.add_argument("--fps", type=int, default=2)
    ap.add_argument("--colmap_dir", default=None,
                    help="existing sparse model dir (skips running colmap)")
    ap.add_argument("--out", default="transforms.json")
    ap.add_argument("--aabb_scale", type=int, default=16)
    ap.add_argument("--run_colmap", action="store_true")
    args = ap.parse_args()

    if args.video:
        run_ffmpeg(args.video, args.images, args.fps)
    colmap_dir = args.colmap_dir
    if colmap_dir is None:
        if args.run_colmap:
            colmap_dir = run_colmap(args.images, ".")
        else:
            for cand in ("colmap_sparse/0", "sparse/0", "colmap"):
                if os.path.exists(cand):
                    colmap_dir = cand
                    break
    if colmap_dir is None:
        raise SystemExit("no sparse model found; pass --colmap_dir or --run_colmap")

    cams, imgs, _ = load_sparse_model(colmap_dir)
    cam = cams[sorted(cams.keys())[0]]
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        fl_x = fl_y = cam.params[0]
        cx, cy = cam.params[1], cam.params[2]
    else:
        fl_x, fl_y = cam.params[0], cam.params[1]
        cx, cy = cam.params[2], cam.params[3]

    frames = []
    c2ws = []
    for k in sorted(imgs.keys()):
        im = imgs[k]
        w2c = np.eye(4)
        w2c[:3, :3] = qvec2rotmat(im.qvec)
        w2c[:3, 3] = im.tvec
        c2w = np.linalg.inv(w2c)
        # flip to nerf convention (y/z flip)
        c2w[0:3, 1] *= -1
        c2w[0:3, 2] *= -1
        c2ws.append(c2w)
        frames.append({"file_path": os.path.join(args.images, im.name),
                       "c2w": c2w})

    # recenter + rescale like instant-ngp
    centers = np.stack([f["c2w"][:3, 3] for f in frames])
    center = centers.mean(0)
    scale = 4.0 / np.percentile(np.linalg.norm(centers - center, axis=-1), 90)
    out_frames = []
    for f in frames:
        m = f["c2w"].copy()
        m[:3, 3] = (m[:3, 3] - center) * scale
        out_frames.append({"file_path": f["file_path"],
                           "transform_matrix": m.tolist()})

    out = {
        "w": int(cam.width), "h": int(cam.height),
        "fl_x": float(fl_x), "fl_y": float(fl_y),
        "cx": float(cx), "cy": float(cy),
        "camera_angle_x": float(2 * math.atan(cam.width / (2 * fl_x))),
        "aabb_scale": args.aabb_scale,
        "frames": out_frames,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {len(out_frames)} frames to {args.out}")


if __name__ == "__main__":
    main()
