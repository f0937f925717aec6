"""Device-mesh helpers.

The reference is single-GPU (SURVEY.md §2.4); scaling here is first-class:
ops shard over a 1-D ICI mesh via ``jax.sharding`` + ``shard_map``. These
helpers build the mesh and shardings the rest of :mod:`kangaroo_tpu.parallel`
uses.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(x, mesh: Mesh, axis: str = "shard"):
    """Place an array with its leading axis sharded across the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
