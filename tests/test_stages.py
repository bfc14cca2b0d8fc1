"""Stage-2 / stage-3 / decode smoke tests on tiny configs."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_hq_tpu.config import Config
from sanerf_hq_tpu.data import make_synthetic_dataset, full_frame_rays
from sanerf_hq_tpu.data.sampler import sample_mask_batch, fixed_fovy_intrinsics
from sanerf_hq_tpu.models import SANeRFField
from sanerf_hq_tpu.ops import HashGridSpec
from sanerf_hq_tpu.train.state import (
    create_train_state,
    freeze_mask_from_loaded,
)
from sanerf_hq_tpu.train.checkpoints import partial_load
from sanerf_hq_tpu.train.steps import (
    make_mask_train_step,
    make_sam_distill_step,
)

SMALL = dict(
    main_spec=HashGridSpec(num_levels=4, level_dim=2, base_resolution=8,
                           log2_hashmap_size=12, desired_resolution=64),
    feat_spec=HashGridSpec(num_levels=4, level_dim=8, base_resolution=8,
                           log2_hashmap_size=12, desired_resolution=64),
    prop_spec_0=HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                             log2_hashmap_size=11, desired_resolution=32),
    prop_spec_1=HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                             log2_hashmap_size=11, desired_resolution=32),
)
CFG = Config(num_steps=(8, 4, 4), num_rays=64, iters=10, bound=4.0,
             min_near=0.05, num_local_sample=2, local_sample_patch_size=4,
             ray_pair_rgb_loss_weight=1.0, ray_pair_rgb_iter=2,
             ray_pair_rgb_num_sample=2, error_map=True, error_map_size=16,
             n_inst=2, label_regularization_weight=0.1,
             online_resolution=32, sam_use_view_direction=True)


def _init(model):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                      jnp.ones((4, 3)))


def test_sam_distill_step_runs_and_freezes_backbone():
    cfg = CFG.replace(with_sam=True)
    # stage-1 params
    m1 = SANeRFField(grid_bound=cfg.grid_bound, **SMALL)
    p1 = _init(m1)
    # stage-2 model with SAM field; hand-off + freeze
    m2 = SANeRFField(grid_bound=cfg.grid_bound, with_sam=True,
                     sam_use_view_direction=True, **SMALL)
    p2 = _init(m2)
    merged, loaded = partial_load(p2, p1)
    assert len(loaded) > 0
    mask = freeze_mask_from_loaded(merged, p1)
    state = create_train_state(merged, 1e-2, cfg.iters, freeze_mask=mask)
    step = make_sam_distill_step(m2, cfg, feat_hw=16)

    ro, rd = full_frame_rays(
        jnp.asarray(make_synthetic_dataset(2, 16, 16)["poses"][0]),
        jnp.asarray([20.0, 20.0, 8.0, 8.0]), 16, 16,
    )
    batch = {
        "rays_o_lr": ro, "rays_d_lr": rd,
        "gt_samvit": jnp.zeros((16, 16, 256)),
    }
    grid_before = np.asarray(state.params["params"]["grid"])
    s_before = np.asarray(state.params["params"]["s_grid"])
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # frozen backbone unchanged; SAM field updated
    np.testing.assert_array_equal(
        np.asarray(state.params["params"]["grid"]), grid_before)
    assert np.any(np.asarray(state.params["params"]["s_grid"]) != s_before)


def test_mask_step_and_error_map():
    cfg = CFG.replace(with_mask=True)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_mask=True,
                        n_inst=cfg.n_inst, **SMALL)
    params = _init(model)
    state = create_train_state(params, 1e-2, cfg.iters)
    step = make_mask_train_step(model, cfg)

    scene = make_synthetic_dataset(n_views=3, H=32, W=32)
    V, H, W = 3, 32, 32
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.integers(0, 2, size=(V, H, W)), jnp.int32)
    poses = jnp.asarray(scene["poses"])
    intr = jnp.asarray(scene["intrinsics"])
    S = cfg.error_map_size
    error_map = jnp.full((V, S * S), 0.1)

    key = jax.random.PRNGKey(2)
    batch = sample_mask_batch(key, masks, poses, intr, error_map,
                              cfg.num_rays, cfg.num_local_sample,
                              cfg.local_sample_patch_size, H, W, S)
    Nl = cfg.num_local_sample * cfg.local_sample_patch_size ** 2
    assert batch["rays_o"].shape == (cfg.num_rays + Nl, 3)
    batch["step"] = jnp.int32(5)  # > ray_pair_rgb_iter -> ray-pair active
    state, metrics, new_em = step(state, batch, key, error_map)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["ray_pair"]) >= 0
    # error map updated at the sampled cells
    assert np.any(np.asarray(new_em) != np.asarray(error_map))


def test_decode_pipeline(tmp_path):
    """End-to-end decode with tiny SAM + tiny field: outputs on disk."""
    from sanerf_hq_tpu.sam.predictor import SamPredictor
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.train import stages
    from sanerf_hq_tpu.utils.points import PointPrompts
    from tests.test_sam import tiny_sam

    cfg = CFG.replace(max_ray_batch=256, feature_container="distill",
                      with_sam=True)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_sam=True,
                        sam_use_view_direction=True, **SMALL)
    trainer = Trainer("t", cfg, model, str(tmp_path / "ws"),
                      use_checkpoint="scratch")
    scene_np = make_synthetic_dataset(n_views=2, H=32, W=32)
    from sanerf_hq_tpu.data.provider import Scene

    scene = Scene(images=scene_np["images"], poses=scene_np["poses"],
                  intrinsics=scene_np["intrinsics"], H=32, W=32,
                  img_names=np.array(["a.png", "b.png"]))
    sam = SamPredictor(tiny_sam(), img_size=64)
    prompts = PointPrompts(
        points=np.array([[0.0, 0.0, 0.0], [0.1, 0.1, 0.0]], np.float32),
        labels=np.array([1, 1], np.int32),
        crucial_label=np.zeros(2, np.int32),
        crucial_count=0, valid_threshold=1,
    )
    out_dir = stages.decode(trainer, scene, sam, prompts,
                            out_dir=str(tmp_path / "masks"),
                            feature_container="distill")
    assert os.path.exists(os.path.join(out_dir, "valid_dict.json"))
    assert os.path.exists(os.path.join(out_dir, "a_obj_mask.npy"))
    m = np.load(os.path.join(out_dir, "a_obj_mask.npy"))
    assert m.shape == (1, 32, 32)  # reference layout (trainer.py:1770)


def test_on_device_render_and_encode(tmp_path):
    """Fused render->SAM-encode path (no host round-trip) matches the
    host-loop set_image path on the same frame (tiny SAM)."""
    from sanerf_hq_tpu.sam.predictor import SamPredictor
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.train.stages import make_render_and_encode
    from sanerf_hq_tpu.data import full_frame_rays
    from tests.test_sam import tiny_sam

    cfg = CFG.replace(max_ray_batch=256, online_resolution=32)
    model = SANeRFField(grid_bound=cfg.grid_bound, **SMALL)
    trainer = Trainer("t", cfg, model, str(tmp_path / "ws"),
                      use_checkpoint="scratch")
    sam = SamPredictor(tiny_sam(), img_size=64)
    rae = make_render_and_encode(trainer, sam.sam, R=32, img_size=64)

    scene = make_synthetic_dataset(n_views=1, H=32, W=32)
    ro, rd = full_frame_rays(jnp.asarray(scene["poses"][0]),
                             jnp.asarray(scene["intrinsics"]), 32, 32)
    feats_dev, _ = rae(trainer.state.params, sam.sam.params, ro, rd)

    # host path on the identical frame
    out = trainer.eval_render(trainer.state.params, ro, rd)
    rgb = (np.clip(np.asarray(out["image"]).reshape(32, 32, 3), 0, 1)
           * 255).astype(np.uint8)
    feats_host = sam.set_image(rgb)[0]
    assert feats_dev.shape == feats_host.shape
    # small diffs allowed: cv2 vs jax.image bilinear resize
    diff = float(jnp.mean(jnp.abs(feats_dev - feats_host)))
    scale = float(jnp.mean(jnp.abs(feats_host))) + 1e-8
    assert diff / scale < 0.2, f"on-device encode deviates: {diff/scale:.3f}"


def test_evaluate_sam_features(tmp_path):
    """Stage-2 feature-MSE eval (nerf/trainer.py:648-691): renders RGB,
    SAM-encodes it as gt, renders the 64x64 s_grid feature map, reports MSE."""
    from sanerf_hq_tpu.sam.predictor import SamPredictor
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.train.stages import evaluate_sam_features
    from sanerf_hq_tpu.data.provider import Scene
    from tests.test_sam import tiny_sam

    # use_default_intrinsics keeps the view's own (non-square) camera;
    # the default eval camera is a square fovy-60 online_resolution one
    # (nerf/provider.py:925-947), covered below
    cfg = CFG.replace(with_sam=True, max_ray_batch=512,
                      use_default_intrinsics=True)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_sam=True,
                        sam_use_view_direction=True, **SMALL)
    trainer = Trainer("t", cfg, model, str(tmp_path / "ws"),
                      use_checkpoint="scratch")
    s = make_synthetic_dataset(n_views=1, H=24, W=32)  # non-square
    scene = Scene(images=s["images"], poses=s["poses"],
                  intrinsics=s["intrinsics"], H=24, W=32,
                  img_names=np.array(["a"]))
    sam = SamPredictor(tiny_sam(), img_size=64)
    mse = evaluate_sam_features(trainer, scene, sam,
                                save_dir=str(tmp_path / "feats"))
    assert np.isfinite(mse) and mse >= 0
    import os as _os
    assert _os.path.exists(str(tmp_path / "feats" / "a_samvit.npy"))

    # default camera gating: fovy-60 square at online_resolution, or the
    # view's focal when --use_default_focal_length
    seen = []
    orig = trainer.render_view

    def spy(pose, intr, H, W, **kw):
        seen.append((np.asarray(intr).copy(), H, W))
        return orig(pose, intr, H, W, **kw)

    trainer.render_view = spy
    trainer.cfg = cfg.replace(use_default_intrinsics=False)
    evaluate_sam_features(trainer, scene, sam)
    R = cfg.online_resolution
    focal60 = R / (2.0 * np.tan(0.5 * np.deg2rad(60.0)))
    assert seen[-1][1] == seen[-1][2] == R
    assert np.allclose(seen[-1][0], [focal60, focal60, R / 2, R / 2])
    trainer.cfg = cfg.replace(use_default_intrinsics=False,
                              use_default_focal_length=True)
    evaluate_sam_features(trainer, scene, sam)
    assert seen[-1][0][0] == pytest.approx(float(s["intrinsics"][0]))
    trainer.render_view = orig
    trainer.cfg = cfg


def test_cp_feature_containers_distill_and_mask():
    """TPU-native s_grid/m_grid redesign (models/mlp_field.py feat_rep
    'cp'): the flagship's feature containers are CP volumes — matmul-bound
    — and must (1) produce the same feature width as the reference hash
    volume, (2) receive gradients in the distill and mask steps while the
    frozen radiance backbone does not."""
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import (create_train_state,
                                           freeze_mask_from_loaded,
                                           mlp_field_lr_scales)
    from sanerf_hq_tpu.train.checkpoints import partial_load

    cfg = CFG.replace(with_sam=True, with_mask=True)
    kw = dict(grid_bound=cfg.grid_bound, with_sam=True, with_mask=True,
              n_inst=2, sam_use_view_direction=True, hidden=32, num_layers=2,
              prop_hidden=16, prop_layers=2, cp_rank=8, cp_res=32,
              feat_rank=16, feat_res=32)
    model = make_field("mlp", feat_rep="cp", **kw)
    params = _init(model)
    names = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(params)]
    assert any("cp_s_proj" in n for n in names)
    assert any("cp_m_x" in n for n in names)
    assert not any("'s_grid'" in n for n in names)

    # feature width parity with the hash container
    model_h = make_field("mlp", feat_rep="hashgrid", **kw)
    params_h = _init(model_h)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (5, 3)),
                    jnp.float32)
    f_cp = model.apply(params, x, method=lambda m, x: m.sam_features(x))
    f_h = model_h.apply(params_h, x, method=lambda m, x: m.sam_features(x))
    assert f_cp.shape == f_h.shape

    # freeze-mask training: backbone frozen, CP features move
    stage1 = make_field("mlp", grid_bound=cfg.grid_bound, hidden=32,
                        num_layers=2, prop_hidden=16, prop_layers=2,
                        cp_rank=8, cp_res=32)
    p1 = _init(stage1)
    params, _ = partial_load(params, p1)
    freeze = freeze_mask_from_loaded(params, p1)
    state = create_train_state(params, 1e-2, 100, freeze_mask=freeze,
                               lr_scales=mlp_field_lr_scales(params))

    distill_step = make_sam_distill_step(model, cfg, feat_hw=8)
    ro, rd = full_frame_rays(jnp.eye(4), jnp.asarray([8.0, 8.0, 4.0, 4.0]),
                             8, 8)
    batch = {"rays_o_lr": ro, "rays_d_lr": rd,
             "gt_samvit": jnp.ones((8, 8, 256)) * 0.1}
    new_state, metrics = distill_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    p_old = state.params["params"]
    p_new = new_state.params["params"]
    assert not np.allclose(p_old["cp_s_x"], p_new["cp_s_x"])
    assert np.allclose(p_old["trunk"]["w0"], p_new["trunk"]["w0"])

    mask_step = make_mask_train_step(model, cfg)
    S = cfg.error_map_size
    Nl = cfg.num_local_sample * cfg.local_sample_patch_size ** 2
    N = cfg.num_rays + Nl
    mb = {
        "rays_o": jnp.tile(ro[:1], (N, 1)), "rays_d": jnp.tile(rd[:1], (N, 1)),
        "gt_masks": jnp.zeros((N,), jnp.int32),
        "img_inds": jnp.zeros((cfg.num_rays,), jnp.int32),
        "inds_coarse": jnp.zeros((cfg.num_rays,), jnp.int32),
        "local_error": jnp.ones((Nl,)), "step": jnp.asarray(5),
    }
    em = jnp.ones((1, S * S))
    new_state2, m2, _ = mask_step(state, mb, jax.random.PRNGKey(1), em)
    assert np.isfinite(float(m2["loss"]))
    assert not np.allclose(p_old["cp_m_x"],
                           new_state2.params["params"]["cp_m_x"])


def test_return_extra_outputs(tmp_path):
    """--return_extra (nerf/trainer.py:886, 1136-1160): test saves the
    per-view extra artifact — rendered 64x64 feature map (with_sam) or
    full-res mask logits (with_mask)."""
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.data.provider import Scene

    cfg = CFG.replace(with_sam=True, with_mask=True, max_ray_batch=512,
                      return_extra=True)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_sam=True,
                        with_mask=True, n_inst=2,
                        sam_use_view_direction=True, **SMALL)
    trainer = Trainer("t", cfg, model, str(tmp_path / "ws"),
                      use_checkpoint="scratch")
    s = make_synthetic_dataset(n_views=1, H=16, W=16)
    scene = Scene(images=s["images"], poses=s["poses"],
                  intrinsics=s["intrinsics"], H=16, W=16,
                  img_names=np.array(["v0"]))
    trainer.test(scene, save_dir=str(tmp_path / "out_sam"), extra="sam")
    feats = np.load(str(tmp_path / "out_sam" / "v0_sam.npy"))
    assert feats.shape[:2] == (64, 64) and np.isfinite(feats).all()
    trainer.test(scene, save_dir=str(tmp_path / "out_mask"), extra="mask")
    logits = np.load(str(tmp_path / "out_mask" / "v0_mask.npy"))
    assert logits.shape == (16, 16, 2) and np.isfinite(logits).all()


def test_error_map_guided_sampling_distribution():
    """High-error cells must be sampled far more often than low-error cells
    (error-map importance sampling, nerf/utils.py:247-258)."""
    scene = make_synthetic_dataset(n_views=2, H=32, W=32)
    poses = jnp.asarray(scene["poses"])
    intr = jnp.asarray(scene["intrinsics"])
    masks = jnp.zeros((2, 32, 32), jnp.int32)
    S = 16
    em = jnp.full((2, S * S), 1e-4)
    hot = 37  # one hot cell per view
    em = em.at[:, hot].set(1.0)
    batch = sample_mask_batch(jax.random.PRNGKey(0), masks, poses, intr, em,
                              512, 1, 2, 32, 32, S)
    frac_hot = float(jnp.mean(batch["inds_coarse"] == hot))
    assert frac_hot > 0.9, f"hot cell sampled only {frac_hot:.2f}"


def test_downscale_intrinsics_nonsquare():
    """A world point projecting to (u, v) full-res must project to
    (u*S/W, v*S/H) in the downscaled camera (VERDICT r1 weak #6: the old
    code used one scale = S/H and cx = cy = S/2, wrong for W != H)."""
    from sanerf_hq_tpu.train.stages import downscale_intrinsics

    H, W, S = 48, 64, 16
    fx, fy, cx, cy = 80.0, 70.0, 30.0, 25.0  # deliberately off-center
    small = downscale_intrinsics([fx, fy, cx, cy], H, W, S)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3)) + np.array([0, 0, 3.0])  # in front of cam
    u_f = fx * pts[:, 0] / pts[:, 2] + cx
    v_f = fy * pts[:, 1] / pts[:, 2] + cy
    u_s = small[0] * pts[:, 0] / pts[:, 2] + small[2]
    v_s = small[1] * pts[:, 1] / pts[:, 2] + small[3]
    np.testing.assert_allclose(u_s, u_f * S / W, rtol=1e-5)
    np.testing.assert_allclose(v_s, v_f * S / H, rtol=1e-5)


def test_update_error_map_nonsquare(tmp_path):
    """update_error_map must work on W != H views (stage-3 on Mip-360)."""
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.train.stages import update_error_map
    from sanerf_hq_tpu.data.provider import Scene

    cfg = CFG.replace(with_mask=True, max_ray_batch=256, error_map_size=8)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_mask=True,
                        n_inst=cfg.n_inst, **SMALL)
    trainer = Trainer("t", cfg, model, str(tmp_path / "ws"),
                      use_checkpoint="scratch")
    H, W, V = 24, 32, 2
    s = make_synthetic_dataset(n_views=V, H=H, W=W)
    scene = Scene(images=s["images"], poses=s["poses"],
                  intrinsics=s["intrinsics"], H=H, W=W,
                  img_names=np.array(["a", "b"]))
    rng = np.random.default_rng(0)
    masks = rng.integers(0, cfg.n_inst, size=(V, H, W)).astype(np.int32)
    em = update_error_map(trainer, scene, masks, s["poses"],
                          s["intrinsics"], H, W)
    S = cfg.error_map_size
    em = np.asarray(em)
    assert em.shape == (V, S * S)
    assert np.all(np.isfinite(em)) and np.all(em >= 0)


def test_adaptive_num_rays_steady_state(tmp_path):
    """adaptive_num_rays jumps to num_points // final-level samples
    (fixed point of nerf/trainer.py:395-397)."""
    from sanerf_hq_tpu.train.trainer import Trainer
    from sanerf_hq_tpu.data.provider import Scene

    cfg = CFG.replace(adaptive_num_rays=True, num_points=1024,
                      num_steps=(8, 4, 4), num_rays=64, iters=2)
    model = SANeRFField(grid_bound=cfg.grid_bound, **SMALL)
    t = Trainer("t", cfg, model, str(tmp_path / "ws"), use_checkpoint="scratch")
    s = make_synthetic_dataset(n_views=2, H=16, W=16)
    scene = Scene(images=s["images"], poses=s["poses"],
                  intrinsics=s["intrinsics"], H=16, W=16,
                  img_names=np.array(["a", "b"]))
    t.train(scene, max_epoch=1)
    assert t.cfg.num_rays == 1024 // 4


def test_freeze_mask_ckpt_loads_without_init_ckpt(tmp_path):
    """A stage-3 checkpoint written under the freeze-mask optimizer
    (--init_ckpt hand-off) must load in --test mode, where no --init_ckpt
    is given and the default optimizer's opt_state tree differs.  Mirrors
    the reference's best-effort optimizer restore
    (nerf/trainer.py:1807-1830): weights load, optimizer resets."""
    from sanerf_hq_tpu.train.trainer import Trainer

    cfg = CFG.replace(with_mask=True)
    model = SANeRFField(grid_bound=cfg.grid_bound, with_mask=True,
                        n_inst=cfg.n_inst, **SMALL)
    # stage-1 backbone params as the init checkpoint (RGB-only model)
    m1 = SANeRFField(grid_bound=cfg.grid_bound, **SMALL)
    init_params = _init(m1)

    ws = str(tmp_path / "ws")
    t1 = Trainer("t", cfg, model, ws, use_checkpoint="scratch",
                 init_params=init_params)
    t1.state = t1.state.replace(step=jnp.asarray(7, jnp.int32))
    t1.ckpt.save(7, t1._state_tree())

    # --test mode: same model, no init_params -> different optimizer tree
    t2 = Trainer("t", cfg, model, ws, use_checkpoint="latest")
    assert int(t2.state.step) == 7
    jax.tree.map(
        np.testing.assert_array_equal, t2.state.params, t1.state.params)
    jax.tree.map(
        np.testing.assert_array_equal, t2.state.ema_params,
        t1.state.ema_params)
