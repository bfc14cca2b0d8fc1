"""Headline benchmark: rendering throughput (Mrays/sec/chip) of the flagship
TPU-native field (MXU-bound freq-MLP backbone, see models/mlp_field.py) with
the full 3-level proposal sampler at the reference cost envelope
(128+64+32 = 224 samples/ray, BASELINE.md).

Timing is honest device time: K renders chained inside ONE jitted
fori_loop with a data dependency, result pulled to host — this amortizes
the per-dispatch RPC latency of the TPU tunnel and defeats async-dispatch
mismeasurement (block_until_ready does not block on this platform).

Prints ONE JSON line.  The headline fields are
{"metric", "value", "unit", "vs_baseline"} (render throughput vs the
2 Mrays/sec/chip north star); the same line also carries the training
rate ("train_steps_per_sec", "train_rays", "train_mrays_per_sec") and the
fused-megakernel gradient-parity verdict ("grad_parity": "pass"/"fail",
worst per-leaf relative-L2 grad diff Pallas-vs-XLA autodiff — Mosaic
divergence from the interpret-mode CI oracle is caught here, per round).

Env knobs: BENCH_FIELD=hashgrid|hashgrid_packed|mlp (default mlp),
BENCH_RAYS, BENCH_ITERS, BENCH_MODE=all|render|train|parity|distill|mask
(all = render + train + parity + stage-2 distill + stage-3 mask rates in
one JSON line), BENCH_CP (CP feature rank of the mlp field; default 64 =
the CLI flagship default, 0 = the plain freq-MLP), BENCH_FEAT_REP=cp|
hashgrid (stage-2/3 feature container; cp = shipping default),
BENCH_BUDGET_S (wall-clock budget, default 420 s: modes that do not fit
are skipped and recorded in "skipped_modes" — an unattended run must emit
its JSON before the driver timeout, not after).

Output discipline: in "all" mode the render headline line is printed and
flushed the moment render_bench finishes, so even a hard external timeout
later in the run leaves a parseable record; the final enriched line
(same headline fields + train/distill/mask/parity attachments) is printed
at the end and supersedes it.
"""
import json
import os
import time

import numpy as np

_T0 = time.perf_counter()


def _elapsed():
    return time.perf_counter() - _T0


def _emit(record):
    print(json.dumps(record), flush=True)


def _mlp_kwargs(field_type):
    """Match the CLI flagship defaults (cli.py --cp_rank 64) so the bench
    measures the shipping config, not a stripped one."""
    if field_type != "mlp":
        return {}
    return {"cp_rank": int(os.environ.get("BENCH_CP", 64))}


def train_bench():
    """steps/s + train Mrays/s of the full stage-1 step (flagship)."""
    import jax
    import jax.numpy as jnp

    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import make_synthetic_dataset, sample_rgb_batch
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import create_train_state, mlp_field_lr_scales
    from sanerf_hq_tpu.train.steps import make_rgb_train_step

    field_type = os.environ.get("BENCH_FIELD", "mlp")
    n_rays = int(os.environ.get("BENCH_RAYS_TRAIN", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    cfg = Config(num_steps=(128, 64, 32), num_rays=n_rays, iters=5000,
                 bound=128.0, contract=True, min_near=0.2,
                 random_image_batch=True, lambda_distort=0.02)
    model = make_field(field_type, grid_bound=cfg.grid_bound,
                       **_mlp_kwargs(field_type))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    scales = mlp_field_lr_scales(params) if field_type == "mlp" else None
    state = create_train_state(params, cfg.lr, cfg.iters, lr_scales=scales)
    # measure the steady-state cadence (step > 3000: proposal nets update
    # 1 step in 5, reference nerf/trainer.py:372-373 — the first 3000
    # steps all take the update branch and run ~25% slower)
    state = state.replace(step=jnp.asarray(3001, jnp.int32))
    train_step = make_rgb_train_step(model, cfg, donate=False)
    scene = make_synthetic_dataset(n_views=8, H=128, W=128)
    images = jnp.asarray(scene["images"])
    poses = jnp.asarray(scene["poses"])
    intr = jnp.asarray(scene["intrinsics"])

    @jax.jit
    def chain(state, key, k):
        def body(i, st):
            kb, kr = jax.random.split(jax.random.fold_in(key, i))
            batch = sample_rgb_batch(kb, images, poses, intr, cfg.num_rays)
            batch["step"] = st.step
            st, _ = train_step(st, batch, kr)
            return st

        return jax.lax.fori_loop(0, k, body, state)

    def pull(st):
        return float(jnp.sum(st.params["params"][
            "trunk" if field_type == "mlp" else "grid"
        ]["w0"] if field_type == "mlp" else st.params["params"]["grid"]))

    st = chain(state, jax.random.PRNGKey(1), 1)
    pull(st)
    t0 = time.perf_counter()
    st = chain(state, jax.random.PRNGKey(2), 1)
    pull(st)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = chain(state, jax.random.PRNGKey(2), 1 + iters)
    pull(st)
    t2 = time.perf_counter() - t0
    per = max((t2 - t1) / iters, 1e-9)
    return {
        "train_steps_per_sec": round(1.0 / per, 2),
        "train_rays": n_rays,
        "train_mrays_per_sec": round(n_rays / per / 1e6, 4),
    }


def distill_bench():
    """Stage-2 distill step rate at the reference shape: 64x64 feature
    rays regressed onto [64, 64, 256] encoder features (the cost envelope
    of scripts/train_sam_nerf.sh's 5000 iters).  Uses the shipping
    flagship config (CP feature containers, models/mlp_field.py
    feat_rep='cp')."""
    import jax
    import jax.numpy as jnp

    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import make_synthetic_dataset, full_frame_rays
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import (create_train_state,
                                           mlp_field_lr_scales)
    from sanerf_hq_tpu.train.steps import make_sam_distill_step

    field_type = os.environ.get("BENCH_FIELD", "mlp")
    iters = int(os.environ.get("BENCH_ITERS_DISTILL", 10))
    feat_rep = os.environ.get("BENCH_FEAT_REP", "cp")
    cfg = Config(num_steps=(128, 64, 32), bound=128.0, contract=True,
                 min_near=0.2, with_sam=True)
    model = make_field(field_type, grid_bound=cfg.grid_bound, with_sam=True,
                       feat_rep=feat_rep, **_mlp_kwargs(field_type))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    scales = mlp_field_lr_scales(params) if field_type == "mlp" else None
    state = create_train_state(params, cfg.lr, 5000, lr_scales=scales)
    # production stage-2 always runs from --init_ckpt with the backbone
    # frozen (reference main.py:249-256), which routes the backbone render
    # through the stop-gradient megakernels; BENCH_FROZEN=0 measures the
    # legacy fully-differentiable path
    frozen = os.environ.get("BENCH_FROZEN", "1") == "1"
    step = make_sam_distill_step(model, cfg, feat_hw=64,
                                 frozen_backbone=frozen)
    scene = make_synthetic_dataset(n_views=1, H=64, W=64)
    ro, rd = full_frame_rays(jnp.asarray(scene["poses"][0]),
                             jnp.asarray(scene["intrinsics"]), 64, 64)
    gt = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 64, 256)), jnp.float32)
    batch = {"rays_o_lr": ro, "rays_d_lr": rd, "gt_samvit": gt}

    @jax.jit
    def chain(state, k):
        def body(i, st):
            st, _ = step(st, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
            return st

        return jax.lax.fori_loop(0, k, body, state)

    def pull(st):
        return float(jnp.sum(jax.tree.leaves(st.params)[0]))

    pull(chain(state, 1))
    t0 = time.perf_counter()
    pull(chain(state, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pull(chain(state, 1 + iters))
    t2 = time.perf_counter() - t0
    per = max((t2 - t1) / iters, 1e-9)
    return {"distill_steps_per_sec": round(1.0 / per, 2),
            "distill_feat_rep": feat_rep}


def mask_bench():
    """Stage-3 object-field step rate at the reference shape: 6000 global
    rays + 4 local 8x8 patches, error-map update, ray-pair RGB loss active
    (scripts/train_obj_nerf.sh's cost envelope)."""
    import jax
    import jax.numpy as jnp

    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import make_synthetic_dataset
    from sanerf_hq_tpu.data.sampler import (fixed_fovy_intrinsics,
                                            sample_mask_batch)
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import (create_train_state,
                                           mlp_field_lr_scales)
    from sanerf_hq_tpu.train.steps import make_mask_train_step

    field_type = os.environ.get("BENCH_FIELD", "mlp")
    iters = int(os.environ.get("BENCH_ITERS_MASK", 10))
    feat_rep = os.environ.get("BENCH_FEAT_REP", "cp")
    cfg = Config(num_steps=(128, 64, 32), bound=128.0, contract=True,
                 min_near=0.2, with_mask=True, n_inst=2, num_rays=6000,
                 ray_pair_rgb_loss_weight=1.0, ray_pair_rgb_threshold=0.1,
                 ray_pair_rgb_iter=150, ray_pair_rgb_num_sample=8,
                 local_sample_patch_size=8, num_local_sample=4,
                 error_map=True)
    model = make_field(field_type, grid_bound=cfg.grid_bound, with_mask=True,
                       n_inst=2, feat_rep=feat_rep,
                       **_mlp_kwargs(field_type))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    scales = mlp_field_lr_scales(params) if field_type == "mlp" else None
    state = create_train_state(params, cfg.lr, 200, lr_scales=scales)
    state = state.replace(step=jnp.asarray(160, jnp.int32))  # ray-pair on
    frozen = os.environ.get("BENCH_FROZEN", "1") == "1"  # see distill_bench
    step = make_mask_train_step(model, cfg, frozen_backbone=frozen)
    H = W = 128
    scene = make_synthetic_dataset(n_views=4, H=H, W=W)
    masks = jnp.asarray(
        (np.asarray(scene["images"])[..., 0] > 0.5).astype(np.int32))
    poses = jnp.asarray(scene["poses"])
    intr = fixed_fovy_intrinsics(H, 60.0)
    S = cfg.error_map_size
    error_map = jnp.ones((4, S * S), jnp.float32)

    @jax.jit
    def chain(state, em, k):
        def body(i, carry):
            st, em = carry
            kb = jax.random.fold_in(jax.random.PRNGKey(2), i)
            batch = sample_mask_batch(
                kb, masks, poses, intr, em, cfg.num_rays,
                cfg.num_local_sample, cfg.local_sample_patch_size, H, W, S,
                use_error_map=True)
            batch["step"] = st.step
            st, _, em = step(st, batch, jax.random.fold_in(kb, 1), em)
            return st, em

        return jax.lax.fori_loop(0, k, body, (state, em))

    def pull(c):
        return float(jnp.sum(jax.tree.leaves(c[0].params)[0]))

    pull(chain(state, error_map, 1))
    t0 = time.perf_counter()
    pull(chain(state, error_map, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pull(chain(state, error_map, 1 + iters))
    t2 = time.perf_counter() - t0
    per = max((t2 - t1) / iters, 1e-9)
    n_rays = cfg.num_rays + cfg.num_local_sample * cfg.local_sample_patch_size ** 2
    return {"mask_steps_per_sec": round(1.0 / per, 2),
            "mask_rays": n_rays,
            "mask_mrays_per_sec": round(n_rays / per / 1e6, 4),
            "mask_feat_rep": feat_rep}


def parity_check():
    """Fused-megakernel grad parity vs XLA autodiff on the full training
    loss surface (see scripts/check_fused_train_grads.py for the verbose
    per-leaf report).  Runs on the real device so Mosaic lowering bugs —
    invisible to the interpret-mode CI tests — surface in the recorded
    bench artifact every round."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from sanerf_hq_tpu.render import RenderSettings, render_rays
    from sanerf_hq_tpu.models import make_field
    import sanerf_hq_tpu.ops.fused_mlp as fm

    n = 512
    model = make_field("mlp", grid_bound=128.0, **_mlp_kwargs("mlp"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3))
    o = 3 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    ro = jnp.asarray(o, jnp.float32)
    rd = jnp.asarray(-o + 0.1 * rng.normal(size=(n, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    s = RenderSettings(num_steps=(32, 16, 8), use_contract=True,
                       min_near=0.2, background="last_sample", bound=128.0,
                       perturb=True, training=True, compute_losses=True)

    def loss(p, upd):
        out = nn.apply(lambda f, *a, **k: render_rays(f, *a, **k), model)(
            p, ro, rd, s, key=jax.random.PRNGKey(3), update_proposal=upd)
        return (jnp.mean((out["image"] - gt) ** 2) + out["proposal_loss"]
                + 0.02 * out["distort_loss"]
                + 1e-3 * jnp.mean(out["weights_sum"])
                + 1e-3 * jnp.mean(out["depth"]))

    worst = 0.0
    worst_leaf = ""
    per_leaf = {}
    prev = fm.PALLAS_ENABLED
    try:
        for upd in (True, False):
            fm.PALLAS_ENABLED = True
            g_f = jax.device_get(
                jax.jit(jax.grad(lambda p: loss(p, upd)))(params))
            fm.PALLAS_ENABLED = False
            g_r = jax.device_get(
                jax.jit(jax.grad(lambda p: loss(p, upd)))(params))
            fl_f = jax.tree_util.tree_leaves_with_path(g_f)
            fl_r = jax.tree.leaves(g_r)
            for (path, a), b in zip(fl_f, fl_r):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                nb = np.linalg.norm(b)
                if nb <= 1e-9:
                    continue
                rel = np.linalg.norm(a - b) / nb
                name = jax.tree_util.keystr(path)
                per_leaf[name] = max(per_leaf.get(name, 0.0), float(rel))
                if rel > worst:
                    worst, worst_leaf = rel, name
    finally:
        fm.PALLAS_ENABLED = prev
    # per-leaf record (VERDICT r3 weak #6: a regression in one small leaf
    # must be visible before it crosses the 10% gate)
    with open("GRAD_PARITY.json", "w") as f:
        json.dump({k: round(v, 5) for k, v in
                   sorted(per_leaf.items(), key=lambda kv: -kv[1])}, f,
                  indent=1)
    # Per-leaf relative-L2 with a 10% budget.  Calibration (v5e, CP-64
    # flagship): the bf16-default-matmul noise floor is ~3.3% relL2 —
    # the *pure-XLA* path is itself 12.8% max-elementwise from a
    # float32-precision oracle on the smallest view-MLP leaf, so a
    # max-elementwise metric is noise-dominated, while a genuine Mosaic
    # lowering bug (dropped term, wrong sign/indexing) lands at O(1) relL2.
    return {"grad_parity": "pass" if worst <= 0.10 else "fail",
            "grad_parity_rel_l2": round(float(worst), 5),
            "grad_parity_worst_leaf": worst_leaf.strip("[]'\""),
            "grad_parity_leaves": "GRAD_PARITY.json"}


def render_bench():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.render import RenderSettings, render_rays

    field_type = os.environ.get("BENCH_FIELD", "mlp")
    # 32 chained renders ~= 0.75 s of device time for the mlp field: long
    # enough that tunnel jitter in the two perf_counter windows stops
    # dominating the per-render estimate (k-sweep probe: 23 ms/render flat
    # from k=2 to k=33), still trivial against the compile cost.
    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    iters = int(os.environ.get("BENCH_ITERS", 32 if field_type == "mlp" else 2))

    model = make_field(field_type, grid_bound=2.0,
                       **_mlp_kwargs(field_type))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.ones((4, 3))
    )
    settings = RenderSettings(
        num_steps=(128, 64, 32), use_contract=True, min_near=0.2,
        background="last_sample", bound=128.0,
    )
    render_fn = nn.apply(
        lambda f, o, d: render_rays(f, o, d, settings), model
    )

    rng = np.random.default_rng(0)
    o = rng.normal(size=(n_rays, 3))
    o = 3.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o + 0.1 * rng.normal(size=(n_rays, 3))
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)

    @jax.jit
    def run(params, rays_o, rays_d, k):
        def body(i, carry):
            out = render_fn(params, rays_o + carry * 0.0, rays_d)
            return carry + (jnp.sum(out["image"]) + jnp.sum(out["depth"])) * 1e-20

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # compile + warmup
    float(run(params, rays_o, rays_d, 1))
    # measure dispatch floor with k=1, then amortized with k=iters+1
    t0 = time.perf_counter()
    float(run(params, rays_o, rays_d, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(params, rays_o, rays_d, 1 + iters))
    t2 = time.perf_counter() - t0
    per_render = max((t2 - t1) / iters, 1e-9)

    mrays = n_rays / per_render / 1e6
    return {
        "metric": f"render_throughput_{field_type}",
        "value": round(mrays, 4),
        "unit": "Mrays/sec/chip",
        "vs_baseline": round(mrays / 2.0, 4),
    }


# Conservative cold-compile wall-time estimates per attachment mode (s):
# a mode is only started when it fits inside BENCH_BUDGET_S.  With a warm
# persistent compile cache every mode runs in seconds; these bounds only
# bite on a fully cold host, where finishing with a partial record beats
# a timeout with no record (VERDICT r4 #1: BENCH_r04 was rc=124/parsed
# null because all-mode compiles overran the driver timeout).
_MODE_EST_S = {"train": 120.0, "distill": 90.0, "mask": 120.0,
               "parity": 120.0}


def main():
    mode = os.environ.get("BENCH_MODE", "all")
    field_type = os.environ.get("BENCH_FIELD", "mlp")
    budget = float(os.environ.get("BENCH_BUDGET_S", 420))
    from sanerf_hq_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    # a tunnel outage silently falls back to CPU; stamp the platform so a
    # CPU run can never masquerade as a TPU number in BENCH_r*.json
    record = {"platform": jax.devices()[0].platform}
    skipped = []

    # The TPU tunnel occasionally stalls for minutes mid-compile; if the
    # driver's external `timeout` fires during such a stall, emit whatever
    # was measured so far (never a fabricated number) before dying so the
    # artifact tail still carries the honest partial record.
    import signal

    def _on_term(signum, frame):
        _emit(dict(record, partial=True,
                   terminated=f"signal {signum} at {_elapsed():.0f}s"))
        os._exit(124)

    signal.signal(signal.SIGTERM, _on_term)

    def fits(m):
        if mode != "all":
            return True  # explicitly requested single mode: always run
        if _elapsed() + _MODE_EST_S[m] <= budget:
            return True
        skipped.append(m)
        return False

    if mode in ("all", "render"):
        record.update(render_bench())
        if mode == "all":
            # early headline: survives a later external timeout
            _emit(dict(record, partial=True))
    if mode in ("all", "train") and fits("train"):
        tr = train_bench()
        if mode == "train":  # standalone: promote to headline fields
            record.update({
                "metric": f"train_step_{field_type}",
                "value": tr["train_steps_per_sec"],
                "unit": "steps/sec/chip",
                "vs_baseline": tr["train_mrays_per_sec"] / 2.0,
            })
        record.update(tr)
    if mode in ("all", "distill") and fits("distill"):
        d = distill_bench()
        if mode == "distill":
            record.update({
                "metric": f"distill_step_{field_type}",
                "value": d["distill_steps_per_sec"],
                "unit": "steps/sec/chip",
                "vs_baseline": d["distill_steps_per_sec"],
            })
        record.update(d)
    if mode in ("all", "mask") and fits("mask"):
        mk = mask_bench()
        if mode == "mask":
            record.update({
                "metric": f"mask_step_{field_type}",
                "value": mk["mask_steps_per_sec"],
                "unit": "steps/sec/chip",
                "vs_baseline": mk["mask_mrays_per_sec"] / 2.0,
            })
        record.update(mk)
    if mode in ("all", "parity") and field_type == "mlp" and fits("parity"):
        try:
            record.update(parity_check())
        except Exception as e:  # parity is an attachment, not the headline
            record.update({"grad_parity": "error",
                           "grad_parity_error": f"{type(e).__name__}: {e}"})
    if skipped:
        record["skipped_modes"] = skipped
    record["bench_elapsed_s"] = round(_elapsed(), 1)
    _emit(record)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # unattended driver run: degrade, don't crash
        import sys

        print(f"[bench] pallas path failed ({type(e).__name__}); "
              "retrying with kernels disabled", file=sys.stderr)
        import sanerf_hq_tpu.ops.fused_mlp as _fm

        _fm.PALLAS_ENABLED = False
        main()
