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


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Production mesh selection (wired through flows/experiments):
    cfg.mesh_shape=None -> single-device (no mesh); otherwise a mesh of
    that shape, 1-D 'data' (training shards the batch; MC eval shards the
    posterior-sample axis over the same devices). cfg.mc_parallel > 1 caps
    the device count used for MC-sample sharding."""
    if cfg.mesh_shape is None:
        return None
    shape = tuple(cfg.mesh_shape)
    n = 1
    for s in shape:
        n *= s
    if n > len(jax.devices()):
        raise ValueError(
            f"mesh_shape {shape} needs {n} devices, have "
            f"{len(jax.devices())}")
    return make_mesh(n_devices=n, shape=shape,
                     axis_names=("data",) if len(shape) == 1
                     else ("data", "sample"))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
