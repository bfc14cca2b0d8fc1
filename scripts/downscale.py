#!/usr/bin/env python
"""Downscale images/ into images_{k}/ (reference: scripts/downscale.py)."""
import argparse
import os

import cv2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="scene dir containing images/")
    ap.add_argument("--downscale", type=int, required=True)
    args = ap.parse_args()

    src = os.path.join(args.path, "images")
    dst = os.path.join(args.path, f"images_{args.downscale}")
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        img = cv2.imread(os.path.join(src, name), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        h, w = img.shape[:2]
        out = cv2.resize(img, (w // args.downscale, h // args.downscale),
                         interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(dst, name), out)
        print(name)


if __name__ == "__main__":
    main()
