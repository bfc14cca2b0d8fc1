"""Measure hash-grid backward strategies on the real device and reproduce
the long-scan TPU worker crash (VERDICT r3 weak #3 / next #4).

The hash-grid backward is the gather transpose: for each (point, level,
corner), grad_table[idx] += w * g.  The reference does this with CUDA
atomicAdd (gridencoder/src/gridencoder.cu:332-347).  On TPU the candidates
are:

  scatter   jax.lax.scatter_add via .at[].add  (current implementation)
  sorted    sort by index, then segment_sum(indices_are_sorted=True)
  onehot    one-hot matmul  grad_table = W^T @ (w*g)  per level — MXU work,
            only affordable for small (dense low-res) levels

Run: python scripts/scatter_backward_probe.py [crash]
  default: rate table for the three strategies at stage-2-like shapes
  crash:   scan a hash-grid train step K steps device-side for growing K
           to find the crash threshold (run LAST; may kill the worker)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rates():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("PROBE_POINTS", 1 << 18))  # points*levels*corners
    C = 2
    SIZE = 1 << 19
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, SIZE, B), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)

    def timeit(fn, idx, vals, iters=8):
        # the carry feeds the VALUES input so the body is not
        # loop-invariant (XLA hoists invariant bodies — docs/PERF.md
        # Pallas lesson #5; the first version of this probe measured a
        # hoisted no-op at "262144000 M/s")
        @jax.jit
        def chain(k):
            # dynamic trip count -> ONE compile per strategy (the static-k
            # version cost 2 tunnel compiles each and timed out the probe)
            def body(i, carry):
                out = fn(idx, vals + carry)
                return jnp.sum(out) * 1e-20

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0),
                                     unroll=False)

        one = jnp.asarray(1, jnp.int32)
        many = jnp.asarray(1 + iters, jnp.int32)
        float(chain(one))
        t0 = time.perf_counter()
        float(chain(one))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(many))
        t2 = time.perf_counter() - t0
        return max((t2 - t1) / iters, 1e-9)

    def scatter(idx, vals):
        return jnp.zeros((SIZE, C), jnp.float32).at[idx].add(vals)

    def sorted_seg(idx, vals):
        order = jnp.argsort(idx)
        return jax.ops.segment_sum(vals[order], idx[order],
                                   num_segments=SIZE,
                                   indices_are_sorted=True)

    def onehot(idx, vals):
        # only viable for small SIZE; measure at 4096 to extrapolate
        S = 4096
        w = (idx[:, None] % S == jnp.arange(S)[None, :]).astype(jnp.float32)
        return jnp.dot(w.T, vals, preferred_element_type=jnp.float32)

    out = {}
    out["scatter_Mupd_s"] = B / timeit(scatter, idx, vals) / 1e6
    out["sorted_segment_Mupd_s"] = B / timeit(sorted_seg, idx, vals) / 1e6
    out["onehot4096_Mupd_s"] = B / timeit(onehot, idx, vals) / 1e6
    import json

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


def crash_probe():
    """Device-side scan of a REAL hash-grid train step for growing K.
    Round-3 observation: K=112 crashed the TPU worker, K<=22 fine; the cap
    was set to 32 without a root cause."""
    import jax
    import jax.numpy as jnp

    from sanerf_hq_tpu.config import Config
    from sanerf_hq_tpu.data import make_synthetic_dataset, sample_rgb_batch
    from sanerf_hq_tpu.models import make_field
    from sanerf_hq_tpu.train.state import create_train_state
    from sanerf_hq_tpu.train.steps import make_rgb_train_step

    cfg = Config(num_steps=(128, 64, 32), num_rays=4096, iters=5000,
                 bound=128.0, contract=True, min_near=0.2,
                 random_image_batch=True)
    model = make_field("hashgrid", grid_bound=cfg.grid_bound)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)))
    state = create_train_state(params, cfg.lr, cfg.iters)
    step = make_rgb_train_step(model, cfg, donate=False)
    scene = make_synthetic_dataset(n_views=4, H=64, W=64)
    images = jnp.asarray(scene["images"])
    poses = jnp.asarray(scene["poses"])
    intr = jnp.asarray(scene["intrinsics"])

    def run_k(k):
        @jax.jit
        def chain(state, key):
            def body(st, i):
                kb, kr = jax.random.split(jax.random.fold_in(key, i))
                batch = sample_rgb_batch(kb, images, poses, intr,
                                         cfg.num_rays)
                batch["step"] = st.step
                st, m = step(st, batch, kr)
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(k))
            return st, losses[-1]

        t0 = time.perf_counter()
        st, loss = chain(state, jax.random.PRNGKey(1))
        loss = float(loss)
        dt = time.perf_counter() - t0
        print(f"K={k}: loss={loss:.5f}, {dt:.1f}s "
              f"({k / dt:.1f} steps/s incl compile)", flush=True)

    for k in (8, 32, 64, 112, 128, 160, 256):
        run_k(k)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "crash":
        crash_probe()
    else:
        rates()
