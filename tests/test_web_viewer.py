"""Web viewer (render/web_viewer.py): HTTP endpoints drive the headless
GUI API — frame rendering, orbiting, point prompts, point-file export
(closes the L5 GUI gap, VERDICT r1 next #9)."""
import json
import os
import urllib.request

import numpy as np
import pytest

from sanerf_hq_tpu.config import Config
from sanerf_hq_tpu.data import make_synthetic_dataset
from sanerf_hq_tpu.data.provider import Scene
from sanerf_hq_tpu.models import SANeRFField
from sanerf_hq_tpu.ops import HashGridSpec
from sanerf_hq_tpu.render.gui_api import InteractiveSession
from sanerf_hq_tpu.render.web_viewer import serve
from sanerf_hq_tpu.train.trainer import Trainer

SMALL = dict(
    main_spec=HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                           log2_hashmap_size=10, desired_resolution=32),
    prop_spec_0=HashGridSpec(num_levels=2, level_dim=2, base_resolution=8,
                             log2_hashmap_size=9, desired_resolution=16),
    prop_spec_1=HashGridSpec(num_levels=2, level_dim=2, base_resolution=8,
                             log2_hashmap_size=9, desired_resolution=16),
)


@pytest.fixture(scope="module")
def viewer(tmp_path_factory):
    # background="white" composites bg_color over residual transmittance
    # (the bg picker is a no-op by design under "last_sample", which gives
    # the final sample all residual weight — same as the reference)
    cfg = Config(num_steps=(8, 4, 2), num_rays=64, iters=10, bound=4.0,
                 min_near=0.05, max_ray_batch=256, background="white")
    model = SANeRFField(grid_bound=cfg.grid_bound, **SMALL)
    ws = str(tmp_path_factory.mktemp("viewer_ws"))
    trainer = Trainer("t", cfg, model, ws, use_checkpoint="scratch")
    s = make_synthetic_dataset(n_views=2, H=16, W=16)
    scene = Scene(images=s["images"], poses=s["poses"],
                  intrinsics=s["intrinsics"], H=16, W=16,
                  img_names=np.array(["a", "b"]))
    sess = InteractiveSession(trainer, scene=scene, W=32, H=32, radius=3.0)
    server, state = serve(sess, port=0, block=False,
                          points_path=os.path.join(ws, "pts.json"))
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, sess, state
    server.shutdown()
    state._stop = True


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, dict(r.headers), r.read()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_index_and_frame(viewer):
    base, sess, _ = viewer
    code, _, body = _get(base, "/")
    assert code == 200 and b"<canvas" in body
    code, headers, body = _get(base, "/frame?ds=2")
    assert code == 200
    assert headers["Content-Type"] == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG magic
    assert float(headers["X-FPS"]) > 0


def test_right_drag_pan_flag(viewer):
    """--gui_mouse_right_drag (nerf/gui.py:444-452): the served page flips
    right-drag from point-select to pan."""
    base, sess, state = viewer
    _, _, body = _get(base, "/")
    assert b"RIGHT_DRAG_PAN=false" in body  # default mapping
    from sanerf_hq_tpu.render.web_viewer import serve

    server2, state2 = serve(sess, port=0, block=False,
                            right_drag_pan=True)
    try:
        base2 = f"http://127.0.0.1:{server2.server_address[1]}"
        _, _, body2 = _get(base2, "/")
        assert b"RIGHT_DRAG_PAN=true" in body2
    finally:
        server2.shutdown()
        state2._stop = True


def test_orbit_changes_camera(viewer):
    base, sess, _ = viewer
    pose0 = sess.camera.pose.copy()
    _post(base, "/orbit", {"dx": 50, "dy": 0})
    _post(base, "/scale", {"delta": 1})
    assert not np.allclose(sess.camera.pose, pose0)


def test_click_picks_point_and_saves(viewer, tmp_path):
    base, sess, state = viewer
    code, out = _post(base, "/click", {"x": 0.5, "y": 0.5, "label": 1})
    assert code == 200 and out["point"] is not None and len(out["point"]) == 3
    # projected overlay has it near the center of the current view
    pts = state.projected_points()
    assert len(pts) == 1
    assert abs(pts[0][0] - 0.5) < 0.1 and abs(pts[0][1] - 0.5) < 0.1
    p = str(tmp_path / "picked.json")
    code, out = _post(base, "/save_points", {"path": p})
    assert code == 200 and out["n"] == 1
    saved = json.load(open(p))
    assert len(saved["points"]) == 1
    assert saved["negative_labels"] == []
    # clicking the same spot again toggles the point off (gui dedup flow)
    code, out = _post(base, "/click", {"x": 0.5, "y": 0.5, "label": 1})
    assert out["point"] is None
    assert len(getattr(sess, "points_3d", [])) == 0


def test_status_endpoint(viewer):
    base, _, _ = viewer
    code, _, body = _get(base, "/status")
    st = json.loads(body)
    assert code == 200 and st["training"] is False
    assert st["bound"] == 4.0 and st["spp"] == 1 and st["fovy"] == 60.0


def test_fovy_slider(viewer):
    base, sess, _ = viewer
    f0 = np.asarray(sess.camera.intrinsics).copy()
    _post(base, "/fovy", {"value": 90})
    assert sess.camera.fovy == 90.0
    assert sess.camera.intrinsics[0] < f0[0]  # wider fov -> shorter focal
    _post(base, "/fovy", {"value": 60})


def test_bg_color_changes_background(viewer):
    """Background rays must composite to the picked bg color (reference
    bg-color picker, nerf/gui.py)."""
    base, sess, _ = viewer
    _post(base, "/bg", {"value": 0.0})
    f_black = sess.render_frame(downscale=2)["image"]
    _post(base, "/bg", {"value": 1.0})
    f_white = sess.render_frame(downscale=2)["image"]
    # untrained field is near-empty -> frames dominated by bg color
    assert f_black.mean() < f_white.mean() - 0.3


def test_aabb_crop(viewer):
    """Crop slider writes the inference AABB (model.aabb_infer,
    nerf/gui.py:349-352): a degenerate crop empties the scene."""
    base, sess, _ = viewer
    code, out = _post(base, "/aabb", {"min": [-0.01, -0.01, -0.01],
                                      "max": [0.01, 0.01, 0.01]})
    assert code == 200 and np.allclose(sess.aabb[:3], -0.01)
    f_crop = sess.render_frame(downscale=2)
    # everything outside the tiny box is cropped -> pure-bg render
    # (deferred color gives empty rays sigmoid(view_mlp(0)) + bg, the
    # reference formula nerf/renderer.py:338-340 — clips to white)
    img = np.clip(f_crop["image"], 0, 1)
    assert float(np.abs(img - 1.0).max()) < 0.05
    # and the crop actually removed density: zero accumulated weight
    assert float(f_crop["depth"].max()) < 1e6  # no NaN/garbage
    code, out = _post(base, "/aabb", {"reset": True})
    assert sess.aabb is None


def test_spp_accumulation(viewer):
    base, sess, _ = viewer
    _post(base, "/spp", {"value": 4})
    assert sess.spp == 4
    f1 = sess.render_frame(downscale=2)
    f2 = sess.render_frame(downscale=2)
    f3 = sess.render_frame(downscale=2)
    assert (f1["spp"], f2["spp"], f3["spp"]) == (1, 2, 3)
    # any camera interaction resets the accumulation
    _post(base, "/orbit", {"dx": 20, "dy": 0})
    f4 = sess.render_frame(downscale=2)
    assert f4["spp"] == 1
    _post(base, "/spp", {"value": 1})


def test_trajectory_record_save(viewer, tmp_path):
    base, sess, _ = viewer
    _post(base, "/clear_trajectory", {})
    code, out = _post(base, "/record_pose", {})
    assert out["n_keyframes"] == 1
    _post(base, "/orbit", {"dx": 80, "dy": 10})
    code, out = _post(base, "/record_pose", {})
    assert out["n_keyframes"] == 2
    p = str(tmp_path / "traj.json")
    code, out = _post(base, "/save_trajectory", {"path": p})
    assert out["n_keyframes"] == 2
    # round-trip through the replay loader (provider.py:504-544 parity)
    from sanerf_hq_tpu.data.trajectory import load_recorded_trajectories

    poses, intr, names = load_recorded_trajectories(str(tmp_path),
                                                    interp_frames=3)
    assert poses.shape[1:] == (4, 4) and poses.shape[0] >= 3
    assert np.allclose(poses[0], sess.trajectory[0], atol=1e-5)
