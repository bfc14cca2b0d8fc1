#!/usr/bin/env python
"""LLFF poses_bounds.npy -> transforms.json converter.

Functional counterpart of the reference's scripts/llff2nerf.py (instant-ngp
lineage): reads the [N, 17] poses_bounds array (3x5 pose+hwf per row, plus
near/far), converts the LLFF (down, right, back) convention to NeRF
(right, up, back), and writes transforms.json with per-frame matrices.
"""
import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="scene dir containing poses_bounds.npy")
    ap.add_argument("--images", default="images", help="image folder name")
    ap.add_argument("--downscale", type=int, default=1)
    args = ap.parse_args()

    pb = np.load(os.path.join(args.path, "poses_bounds.npy"))  # [N, 17]
    n = pb.shape[0]
    poses = pb[:, :15].reshape(-1, 3, 5)  # [N, 3, 5]
    hwf = poses[0, :, 4]
    H, W, focal = hwf
    H, W, focal = H / args.downscale, W / args.downscale, focal / args.downscale

    img_dir = os.path.join(args.path, args.images)
    names = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    assert len(names) == n, f"{len(names)} images vs {n} poses"

    frames = []
    for i in range(n):
        m = poses[i, :, :4]  # [3, 4] LLFF: [down, right, back]
        # LLFF -> NeRF convention: (x, y, z) = (right, up, back)
        m = np.concatenate([m[:, 1:2], -m[:, 0:1], m[:, 2:3], m[:, 3:4]], 1)
        mat = np.eye(4)
        mat[:3] = m
        frames.append({
            "file_path": os.path.join(args.images, names[i]),
            "transform_matrix": mat.tolist(),
        })

    out = {
        "w": int(W), "h": int(H),
        "fl_x": float(focal), "fl_y": float(focal),
        "cx": W / 2, "cy": H / 2,
        "camera_angle_x": float(2 * np.arctan(W / (2 * focal))),
        "frames": frames,
    }
    with open(os.path.join(args.path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {n} frames to transforms.json")


if __name__ == "__main__":
    main()
