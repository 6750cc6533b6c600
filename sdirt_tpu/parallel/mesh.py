"""Device-mesh construction and sharding helpers.

The workload's parallel axes (SURVEY.md parallelism inventory):
  * 'data'  — batch/point parallelism (the reference's disabled DDP path,
              2_dfdp_net.py:11-13, reborn as pjit batch sharding)
  * 'rays'  — Monte-Carlo ray-axis sharding: spp pupil samples split across
              chips, PSF grids psum-reduced by XLA (the large-dimension /
              sequence-parallel analog for this workload)

Collectives ride ICI automatically once shardings are annotated — no
hand-written NCCL/MPI equivalent exists or is needed.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_rays: int = 1, devices=None) -> Mesh:
    """A ('data', 'rays') mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_data is None:
        n_data = n // n_rays
    assert n_data * n_rays == n, (n_data, n_rays, n)
    dev_array = np.asarray(devices).reshape(n_data, n_rays)
    return Mesh(dev_array, ("data", "rays"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading axis split over 'data'."""
    return jax.device_put(batch, data_sharded(mesh))
