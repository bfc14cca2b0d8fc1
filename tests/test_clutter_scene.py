"""The harder quality-benchmark scene (VERDICT r4 #5): 7 labeled objects,
high-frequency textures, occlusion, and an extrapolated-view val split
written as a reference-format stems list (provider.py:632 semantics)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sanerf_hq_tpu.data.synthetic import (make_clutter_dataset,
                                          render_clutter_scene)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clutter_scene_labels_and_occlusion():
    d = make_clutter_dataset(n_views=8, H=60, W=80, n_extrap=2)
    assert d["images"].shape == (10, 60, 80, 3)
    assert d["n_inst"] == 8
    # all 8 instance labels appear somewhere in the rig
    assert set(np.unique(d["obj_ids"])) == set(range(8))
    # the tucked-away sphere (object 5) is heavily occluded by the box:
    # visible, but far smaller than its unoccluded siblings
    counts = [(d["obj_ids"] == k).sum() for k in range(8)]
    assert 0 < counts[5] < counts[3] and counts[5] < counts[4]
    # extrapolated val views are outside the train elevation envelope
    train_z = d["poses"][:8, 1, 3]
    val_z = d["poses"][8:, 1, 3]
    assert val_z.min() > train_z.max()
    assert d["val_names"] == ["v008", "v009"]


def test_clutter_high_frequency_content():
    """The scene must be texturally harder than a flat-color render:
    mean |horizontal gradient| well above a blurred version of itself."""
    d = make_clutter_dataset(n_views=2, H=120, W=160, n_extrap=0)
    img = d["images"][0]
    grad = np.abs(np.diff(img, axis=1)).mean()
    assert grad > 0.02, f"scene too smooth: {grad}"


def test_clutter_export_and_val_split(tmp_path):
    """Disk export drives the provider end-to-end: the extrapolated views
    land in val via --val_type val_split and are EXCLUDED from train."""
    root = str(tmp_path / "scene")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_synth_scene.py"),
         root, "--scene", "clutter", "--n_views", "6", "--H", "48",
         "--W", "64"],
        check=True, cwd=REPO)
    with open(os.path.join(root, "test_views.json")) as f:
        tv = json.load(f)["test_view_list"]
    assert len(tv) == 4 and tv[0] == "v006"

    from sanerf_hq_tpu.data.provider import load_scene, split_indices

    scene = load_scene(root, data_type="llff")
    n = scene.poses.shape[0]
    assert n == 10  # 6 ring + 4 extrapolated
    train_idx = split_indices(n, "train", "val_split", tv, scene.img_names)
    val_idx = split_indices(n, "val", "val_split", tv, scene.img_names)
    assert len(val_idx) == 4 and len(train_idx) == 6
    train_stems = {os.path.splitext(str(scene.img_names[i]))[0]
                   for i in train_idx}
    assert train_stems.isdisjoint(tv)
    # gt masks cover all instances
    gt = np.load(os.path.join(root, "gt_masks", "v000.npy"))
    assert gt.shape == (48, 64)
