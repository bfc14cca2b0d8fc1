"""Headline benchmark: rendering throughput (Mrays/sec/chip) of the flagship
TPU-native field (MXU-bound freq-MLP backbone, see models/mlp_field.py) with
the full 3-level proposal sampler at the reference cost envelope
(128+64+32 = 224 samples/ray, BASELINE.md).

Timing is honest device time: K renders chained inside ONE jitted
fori_loop with a data dependency, result pulled to host — this amortizes
the per-dispatch RPC latency of the TPU tunnel and defeats async-dispatch
mismeasurement (block_until_ready does not block on this platform).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline is vs the 2 Mrays/sec/chip north-star target.

Env knobs: BENCH_FIELD=hashgrid|hashgrid_packed|mlp (default mlp),
BENCH_RAYS, BENCH_ITERS, BENCH_MODE=render|train.
"""
import json
import os
import time

import numpy as np


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
    n_rays = int(os.environ.get("BENCH_RAYS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    cfg = Config(num_steps=(128, 64, 32), num_rays=n_rays, iters=5000,
                 bound=128.0, contract=True, min_near=0.2,
                 random_image_batch=True, lambda_distort=0.02)
    model = make_field(field_type, grid_bound=cfg.grid_bound)
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
    print(json.dumps({
        "metric": f"train_step_{field_type}",
        "value": round(1.0 / per, 2),
        "unit": "steps/sec/chip",
        "vs_baseline": round(n_rays / per / 2e6, 4),
    }))


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.render import RenderSettings, render_rays

    if os.environ.get("BENCH_MODE", "render") == "train":
        return train_bench()

    field_type = os.environ.get("BENCH_FIELD", "mlp")
    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    iters = int(os.environ.get("BENCH_ITERS", 8 if field_type == "mlp" else 2))

    model = make_field(field_type, grid_bound=2.0)
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
    print(json.dumps({
        "metric": f"render_throughput_{field_type}",
        "value": round(mrays, 4),
        "unit": "Mrays/sec/chip",
        "vs_baseline": round(mrays / 2.0, 4),
    }))


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
