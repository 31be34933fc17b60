"""Device-mesh helpers: data-parallel training over TPU ICI.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(train_model.py:355-356).  The TPU-native equivalent is SPMD: one jitted
program over a 1-D ``jax.sharding.Mesh`` of chips with the batch sharded on
the ``data`` axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI automatically.  Works identically on a real TPU slice
and on a virtual CPU mesh (``--xla_force_host_platform_device_count``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch (pytree of arrays, leading dim = batch) onto the
    mesh, split across ``axis``.  Batch size must divide evenly."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
