"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: the standard JAX way to test pjit sharding w/o a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sanerf_hq_tpu.parallel import make_mesh, shard_rays, data_sharding, replicate


def test_mesh_creation():
    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == len(jax.devices())


def test_sharded_train_step_8dev():
    """The full stage-1 step with rays sharded over 8 devices; params
    replicated; gradient all-reduce implicit."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_eval_reduction():
    """Eval metric reduction across the mesh (replaces the reference's
    dist.all_reduce at nerf/trainer.py:1577-1601 — including NOT
    replicating its preds_extra gather bug)."""
    mesh = make_mesh((8,), ("data",))
    sh = data_sharding(mesh)

    x = jnp.arange(64, dtype=jnp.float32)
    xs = jax.device_put(x, sh)

    @jax.jit
    def mean_psnr(v):
        # simulating a per-ray squared error -> global mean
        return jnp.mean(v ** 2)

    out = float(mean_psnr(xs))
    np.testing.assert_allclose(out, np.mean(np.arange(64.0) ** 2), rtol=1e-6)


def test_shard_rays_placement():
    mesh = make_mesh((8,), ("data",))
    batch = {
        "rays_o": jnp.zeros((64, 3)),
        "rays_d": jnp.zeros((64, 3)),
        "step": jnp.zeros((), jnp.int32),
    }
    placed = shard_rays(mesh, batch)
    assert placed["rays_o"].sharding.is_equivalent_to(
        data_sharding(mesh), ndim=2
    )
    assert placed["step"].sharding.is_equivalent_to(replicate(mesh), ndim=0)
