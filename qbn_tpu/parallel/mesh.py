"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over the first n devices.

    Default is a 1-D 'data' mesh (data parallel); pass shape + axis_names
    for e.g. ('data', 'sample') 2-D meshes where MC samples shard over the
    second axis.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    devs = np.asarray(devices).reshape(shape)
    return Mesh(devs, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
