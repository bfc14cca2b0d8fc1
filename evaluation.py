#!/usr/bin/env python
"""Offline cross-method mask benchmark (reference: evaluation.py:1-271).

Two modes:

  simple      accumulated IoU / pixel accuracy of one prediction folder
              against one GT folder (handy for single runs).

  benchmark   full reference scope (evaluation.py:107-247): per-OBJECT
              accumulation over the eval views of every scene listed in the
              metadata jsons, with per-method mask loaders — ours
              (argmax of {img}_mask.npy), SA3D (DIFF-based recovery from
              masked_img vs 0.3*ori_img renders, evaluation.py:41-57), ISRF
              (channel-0 > 0 pngs, evaluation.py:74-83).  Reports per-object
              acc/IoU and the per-data-type mean over objects, exactly like
              the reference's printout.  Unlike the reference (hardcoded
              cluster paths, evaluation.py:92-113), every root is a CLI arg.

Usage (benchmark):
  python evaluation.py benchmark --method ours --img_root <runs_root> \
      --mask_data_root <gt_masks> --meta <scenes_metadata_v2.json> \
      --scene_list <scene_list.json> --eval_views <scenes_test_view.json>
"""
from __future__ import annotations

import argparse
import json
import os
from os import path

import numpy as np


# ---------------------------------------------------------------------------
# mask loading
# ---------------------------------------------------------------------------

def load_mask(p: str):
    if p.endswith(".npy"):
        m = np.load(p)
        if m.ndim == 3:  # probabilities [H, W, C] or [C, H, W]
            m = m.argmax(0) if m.shape[0] < m.shape[-1] else m.argmax(-1)
        return m.astype(np.int64)
    import cv2

    img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    return (img > 127).astype(np.int64)


# per-method prediction loaders (reference evaluation.py:8-83).
# Each returns a binary/int mask [H, W] for (scene, object, img_id).

def _load_ours(img_root, object_name, scene_name, img_id, variant=""):
    suffix = f"-{variant}" if variant else ""
    p = path.join(img_root, f"{scene_name}-{object_name}{suffix}",
                  "results", f"{img_id}_mask.npy")
    return np.load(p).argmax(-1)


def _load_sa3d(img_root, object_name, scene_name, img_id,
               root="nerf_unbounded"):
    """SA3D saves masked renders, not masks — recover the mask from the
    difference of the masked image vs 0.3x the original render
    (reference evaluation.py:41-57)."""
    import cv2

    base = path.join(img_root, root, f"dvgo_{scene_name}",
                     f"render_test_{object_name}")
    masked = cv2.imread(path.join(base, "masked_img", f"rgb_{img_id}.png"))
    ori = cv2.imread(path.join(base, "ori_img", f"{img_id}.png"))
    diff = np.abs(masked - ori * 0.3).sum(-1)
    return diff > 5


def _load_isrf(img_root, object_name, scene_name, img_id):
    import cv2

    p = path.join(img_root, f"{scene_name}_{object_name}", "test",
                  f"{img_id}.png")
    return cv2.imread(p)[..., 0] > 0


METHOD_LOADERS = {
    "ours": lambda r, o, s, i: _load_ours(r, o, s, i, "nerf"),
    "ours_rgb": lambda r, o, s, i: _load_ours(r, o, s, i, "nerf-rgb"),
    "ours_sam": lambda r, o, s, i: _load_ours(r, o, s, i, "sam"),
    "ours_hq_sam": lambda r, o, s, i: _load_ours(r, o, s, i, "hq_sam"),
    "ours_hq_sam_nerf": lambda r, o, s, i: _load_ours(r, o, s, i,
                                                      "hq_sam_nerf"),
    "sa3d": _load_sa3d,
    "isrf": _load_isrf,
}


# ---------------------------------------------------------------------------
# metrics (reference evaluation.py:249-271)
# ---------------------------------------------------------------------------

def eval_iou(pred, gt):
    inter = np.logical_and(pred > 0, gt > 0).sum()
    union = np.logical_or(pred > 0, gt > 0).sum()
    return inter, union


def eval_acc(pred, gt):
    # reference counts non-xor pixels (evaluation.py:196-199)
    false_pred = np.logical_xor(pred > 0, gt > 0).sum()
    return gt.size - false_pred, gt.size


def _resize_gt_like(gt, pred):
    if gt.shape[:2] != pred.shape[:2]:
        import cv2

        assert abs(pred.shape[0] / gt.shape[0]
                   - pred.shape[1] / gt.shape[1]) < 0.1
        gt = cv2.resize(gt.astype(np.uint8), (pred.shape[1], pred.shape[0]),
                        interpolation=cv2.INTER_NEAREST)
    return gt


# ---------------------------------------------------------------------------
# modes
# ---------------------------------------------------------------------------

def run_simple(args):
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
        gt = _resize_gt_like(load_mask(gt_path), pred)
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


def run_benchmark(args):
    loader = METHOD_LOADERS[args.method]
    with open(args.scene_list) as f:
        scene_dict = json.load(f)
    with open(args.meta) as f:
        meta = json.load(f)
    with open(args.eval_views) as f:
        eval_views = json.load(f)

    report = {}
    data_types = ([args.data_type] if args.data_type
                  else list(scene_dict.keys()))
    for data_type in data_types:
        total_acc = total_iou = 0.0
        obj_count = 0
        objects = {}
        for scene_name in scene_dict[data_type]:
            scene_gt_root = path.join(args.mask_data_root, scene_name)
            for object_name in meta.get(scene_name, {}):
                cur_i = cur_u = cur_c = cur_t = 0
                for img_id in eval_views[scene_name][object_name]:
                    pred = np.asarray(
                        loader(args.img_root, object_name, scene_name,
                               img_id))
                    import cv2

                    gt = cv2.imread(path.join(scene_gt_root, object_name,
                                              f"{img_id}_mask.png"))[..., 0]
                    gt = _resize_gt_like(gt, pred) > 128
                    i, u = eval_iou(pred, gt)
                    c, t = eval_acc(pred, gt)
                    cur_i += i
                    cur_u += u
                    cur_c += c
                    cur_t += t
                obj_acc = cur_c / max(cur_t, 1)
                obj_iou = cur_i / max(cur_u, 1)
                print(f"{scene_name}_{object_name} acc: {obj_acc} "
                      f"iou: {obj_iou}")
                objects[f"{scene_name}_{object_name}"] = {
                    "acc": float(obj_acc), "iou": float(obj_iou)}
                total_acc += obj_acc
                total_iou += obj_iou
                obj_count += 1
        print(f"{data_type}:")
        print("acc: ", total_acc / max(obj_count, 1))
        print("miou: ", total_iou / max(obj_count, 1))
        report[data_type] = {
            "acc": float(total_acc / max(obj_count, 1)),
            "miou": float(total_iou / max(obj_count, 1)),
            "objects": objects,
        }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode")

    sp = sub.add_parser("simple", help="one pred folder vs one gt folder")
    sp.add_argument("--pred_root", required=True)
    sp.add_argument("--gt_root", required=True)
    sp.add_argument("--suffix", default="_obj_mask.npy")
    sp.add_argument("--out", default=None)

    bp = sub.add_parser("benchmark", help="reference cross-method benchmark")
    bp.add_argument("--method", default="ours", choices=sorted(METHOD_LOADERS))
    bp.add_argument("--img_root", required=True,
                    help="method results root (get_img_root in the reference)")
    bp.add_argument("--mask_data_root", required=True,
                    help="GT masks root: {scene}/{object}/{img}_mask.png")
    bp.add_argument("--meta", required=True,
                    help="scenes metadata json: {scene: {object: ...}}")
    bp.add_argument("--scene_list", required=True,
                    help="json: {data_type: [scene, ...]}")
    bp.add_argument("--eval_views", required=True,
                    help="json: {scene: {object: [img_id, ...]}}")
    bp.add_argument("--data_type", default=None,
                    help="restrict to one data type (reference loops llff)")
    bp.add_argument("--out", default=None)

    # legacy invocation (no subcommand) == simple
    import sys

    if len(sys.argv) < 2 or sys.argv[1] not in ("simple", "benchmark", "-h",
                                                "--help"):
        sp2 = argparse.ArgumentParser()
        sp2.add_argument("--pred_root", required=True)
        sp2.add_argument("--gt_root", required=True)
        sp2.add_argument("--suffix", default="_obj_mask.npy")
        sp2.add_argument("--out", default=None)
        run_simple(sp2.parse_args())
        return
    args = ap.parse_args()
    if args.mode == "simple":
        run_simple(args)
    else:
        run_benchmark(args)


if __name__ == "__main__":
    main()
