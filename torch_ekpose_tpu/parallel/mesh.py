"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference train.py:106) with implicit scatter/gather. The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over the ``data`` axis: batches
are sharded across devices, parameters are replicated, and XLA inserts the
gradient all-reduce (psum over ICI) during ``jax.jit`` partitioning — no
explicit collective code is needed at this scale.

The mesh axis layout is kept in one place so a future 2-D (data x model)
layout only changes this module.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch"]

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. ``num_devices=0`` uses all local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
