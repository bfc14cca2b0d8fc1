"""Device mesh + sharding layout.

TPU-native parallelism design (SURVEY.md §2.3): the scaling axis of this
workload is *rays* — parameters are tiny (~30 MB) and fully replicated, the
ray batch is sharded over the mesh's "data" axis, and the gradient
all-reduce is implicit in jit's partitioning of the replicated-param update.
The reference's torch.distributed/DDP plumbing (nerf/trainer.py:119-122,
never actually initialized — SURVEY §2.3) maps to exactly this.

Multi-host: call jax.distributed.initialize() before make_mesh(); the same
code then spans slices with collectives riding ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,), axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh; -1 in shape absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s > 0])) if any(s > 0 for s in shape) else 1
    for i, s in enumerate(shape):
        if s == -1:
            shape[i] = len(devices) // known
    n = int(np.prod(shape))
    mesh_devices = np.asarray(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, batch, axis: str = "data"):
    """Place a batch pytree: leading dim sharded across `axis`, scalars
    replicated."""
    sh = data_sharding(mesh, axis)
    rep = replicate(mesh)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0 and x.shape[0] > 1:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)
