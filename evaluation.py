#!/usr/bin/env python
"""Offline cross-method mask benchmark (reference: evaluation.py:107-271).

Computes accumulated IoU and pixel accuracy of predicted object masks
against ground-truth masks, per object/scene.  Unlike the reference (which
hardcodes cluster paths, evaluation.py:92-113), paths are CLI arguments.

Prediction formats supported (reference behavior):
  - {img}_mask.npy with per-class probabilities -> argmax
  - {img}_obj_mask.npy binary masks (decode output)
GT: {img}.npy / {img}.png integer label maps in --gt_root.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_mask(path: str):
    if path.endswith(".npy"):
        m = np.load(path)
        if m.ndim == 3:  # probabilities [H, W, C] or [C, H, W]
            if m.shape[0] < m.shape[-1]:
                m = m.argmax(0)
            else:
                m = m.argmax(-1)
        return m.astype(np.int64)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return (img > 127).astype(np.int64)


def eval_iou(pred, gt):
    """Accumulated intersection/union counts (reference evaluation.py:249-262)."""
    inter = np.logical_and(pred > 0, gt > 0).sum()
    union = np.logical_or(pred > 0, gt > 0).sum()
    return inter, union


def eval_acc(pred, gt):
    correct = (pred == gt).sum()
    total = gt.size
    return correct, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_root", required=True,
                    help="directory of predicted {img}_obj_mask.npy / _mask.npy")
    ap.add_argument("--gt_root", required=True,
                    help="directory of GT label maps")
    ap.add_argument("--suffix", default="_obj_mask.npy")
    ap.add_argument("--out", default=None, help="optional json report path")
    args = ap.parse_args()

    inter_acc = union_acc = correct_acc = total_acc = 0
    per_image = {}
    names = sorted(
        f[: -len(args.suffix)] for f in os.listdir(args.pred_root)
        if f.endswith(args.suffix)
    )
    for name in names:
        pred = load_mask(os.path.join(args.pred_root, name + args.suffix))
        gt_path = None
        for ext in (".npy", ".png", ".jpg"):
            cand = os.path.join(args.gt_root, name + ext)
            if os.path.exists(cand):
                gt_path = cand
                break
        if gt_path is None:
            continue
        gt = load_mask(gt_path)
        if gt.shape != pred.shape:
            import cv2

            gt = cv2.resize(gt.astype(np.uint8), pred.shape[::-1],
                            interpolation=cv2.INTER_NEAREST).astype(np.int64)
        i, u = eval_iou(pred, gt)
        c, t = eval_acc(pred, gt)
        inter_acc += i
        union_acc += u
        correct_acc += c
        total_acc += t
        per_image[name] = {"iou": float(i / max(u, 1)),
                           "acc": float(c / max(t, 1))}

    report = {
        "accumulated_iou": float(inter_acc / max(union_acc, 1)),
        "pixel_accuracy": float(correct_acc / max(total_acc, 1)),
        "num_images": len(per_image),
        "per_image": per_image,
    }
    print(json.dumps({k: report[k] for k in
                      ("accumulated_iou", "pixel_accuracy", "num_images")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
