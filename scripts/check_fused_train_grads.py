#!/usr/bin/env python
"""Grad parity: fused training megakernels vs the pure-XLA renderer path.

Run ON TPU (the CPU test suite cannot execute Mosaic kernels; the pure-XLA
renderer whose autodiff this script compares against IS the CPU-suite
oracle).  Exercises the custom-VJP level kernels in
ops/render_level_pallas.py through the full loss surface the train step
uses: image MSE + proposal + distortion + weights_sum + depth terms, with
proposal updates both on and off (reference gating:
/root/reference/nerf/trainer.py:372-373).

Exit code 0 iff every param-leaf gradient matches within 10% relative
L2.  Calibration (v5e): bf16 default-matmul noise puts the pure-XLA path
itself ~13% max-elementwise from a float32-precision oracle on the tiny
view-MLP leaves, so elementwise max is noise-dominated; per-leaf relL2
noise floor is ~3.3%, and a real Mosaic lowering bug lands at O(1).
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from sanerf_hq_tpu.render import RenderSettings, render_rays
from sanerf_hq_tpu.models import make_field
import sanerf_hq_tpu.ops.fused_mlp as fm

n = 512
model = make_field("mlp", grid_bound=128.0,
                   cp_rank=int(os.environ.get("BENCH_CP", 64)))
params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.ones((4, 3)))
rng = np.random.default_rng(0)
o = rng.normal(size=(n, 3))
o = 3 * o / np.linalg.norm(o, axis=-1, keepdims=True)
ro = jnp.asarray(o, jnp.float32)
rd = jnp.asarray(-o + 0.1 * rng.normal(size=(n, 3)), jnp.float32)
gt = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

s = RenderSettings(num_steps=(32, 16, 8), use_contract=True, min_near=0.2,
                   background="last_sample", bound=128.0, perturb=True,
                   training=True, compute_losses=True)


def loss(p, upd):
    out = nn.apply(lambda f, *a, **k: render_rays(f, *a, **k), model)(
        p, ro, rd, s, key=jax.random.PRNGKey(3), update_proposal=upd)
    return (jnp.mean((out["image"] - gt) ** 2) + out["proposal_loss"]
            + 0.02 * out["distort_loss"] + 1e-3 * jnp.mean(out["weights_sum"])
            + 1e-3 * jnp.mean(out["depth"]))


failed = False
for upd in (True, False):
    fm.PALLAS_ENABLED = True
    v_f, g_f = jax.jit(jax.value_and_grad(lambda p: loss(p, upd)))(params)
    v_f = float(v_f)
    g_f = jax.device_get(g_f)
    fm.PALLAS_ENABLED = False
    v_r, g_r = jax.jit(jax.value_and_grad(lambda p: loss(p, upd)))(params)
    v_r = float(v_r)
    g_r = jax.device_get(g_r)
    print(f"upd={upd} loss fused={v_f:.6f} ref={v_r:.6f} "
          f"rel={abs(v_f - v_r) / abs(v_r):.2e}")
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_f),
                            jax.tree.leaves(g_r)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        bad = rel > 0.10 and np.linalg.norm(b) > 1e-9
        failed |= bad
        name = jax.tree_util.keystr(path)
        print(f"  {name:55s} |g_ref|max={np.abs(b).max():.3e} "
              f"rel_l2={rel:.3e}{' <-- MISMATCH' if bad else ''}")

print("FAIL" if failed else "PASS")
sys.exit(1 if failed else 0)
