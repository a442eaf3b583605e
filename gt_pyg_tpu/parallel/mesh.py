"""Device mesh construction and sharding helpers.

The reference has no distribution layer (SURVEY.md §2.3); here scaling is
expressed TPU-natively: a ``jax.sharding.Mesh`` over the chips, data
parallelism via ``shard_map`` (each chip owns whole molecules), gradient
psum over ICI, and an edge-partitioned GSPMD mode for giant batched
graphs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[dict] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default is 1-D data parallelism over all devices.

    ``axis_sizes`` e.g. {"data": 8} or {"data": 4, "model": 2}.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {need} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard along the leading (per-device batch) dimension."""
    return NamedSharding(mesh, P(axis))


def shard_batch_tree(tree, mesh: Mesh, axis: str = "data"):
    """Device-put a stacked [D, ...] pytree with the leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
