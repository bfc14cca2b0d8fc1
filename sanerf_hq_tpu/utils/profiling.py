"""Profiling / timing utilities (SURVEY.md §5 tracing plan).

The axon TPU platform's block_until_ready does not block, so all timing
pulls a scalar to host and amortizes the dispatch RTT by chaining K
iterations in one jitted fori_loop (see docs/PERF.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time(fn: Callable, *args, iters: int = 6) -> float:
    """Seconds per call of `fn(*args)` measured on-device."""

    @jax.jit
    def run(k, *a):
        def body(i, c):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return c + jnp.sum(leaf[(0,) * leaf.ndim]) * 1e-20

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(run(1, *args))  # compile + warm
    t0 = time.perf_counter()
    float(run(1, *args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(1 + iters, *args))
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / iters, 1e-9)


def mrays_per_sec(render_fn, params, rays_o, rays_d, iters: int = 6) -> float:
    t = device_time(lambda p, o, d: render_fn(p, o, d), params, rays_o,
                    rays_d, iters=iters)
    return rays_o.shape[0] / t / 1e6


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (inspect with TensorBoard / xprof)."""
    try:
        jax.profiler.start_trace(logdir)
        yield logdir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def seed_everything(seed: int):
    """numpy + python RNG seeding (reference nerf/utils.py:344); JAX is
    functional — pass PRNG keys explicitly."""
    import os
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
