"""Device-mesh helpers: data-parallel training over TPU ICI (and DCN).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(train_model.py:355-356).  The TPU-native equivalent is SPMD: one jitted
program over a 1-D ``jax.sharding.Mesh`` of chips with the batch sharded on
the ``data`` axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI automatically.  Works identically on a real TPU slice
and on a virtual CPU mesh (``--xla_force_host_platform_device_count``).

Multi-host boundary: models are ~100K-400K params, so a single slice is
far more than enough — multi-slice (DCN) scaling is intentionally out of
scope.  For multi-HOST single-slice pods, :func:`maybe_init_distributed`
wires ``jax.distributed.initialize`` (env-triggered; TPU pods auto-discover
the coordinator) and ``make_mesh`` spans the global device set; this path
is untestable on this single-host machine and is provided as documented
plumbing, not a verified feature.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_distributed_initialized = False


def maybe_init_distributed() -> bool:
    """Initialize the JAX distributed runtime when multi-host env config is
    present (``LERF_DISTRIBUTED=1`` forces it; on TPU pods
    ``jax.distributed.initialize()`` self-discovers coordinator/process
    ids).  No-op on single-host runs.  Returns True when initialized."""
    global _distributed_initialized
    if _distributed_initialized:
        return True
    if os.environ.get("LERF_DISTRIBUTED", "") not in ("1", "true"):
        return False
    jax.distributed.initialize()
    _distributed_initialized = True
    return True


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) devices.

    Defaults to ``jax.devices()`` — the GLOBAL device list, so after
    :func:`maybe_init_distributed` on a multi-host pod the mesh spans all
    hosts' chips and the same SPMD program scales out over ICI."""
    if devices is None:
        maybe_init_distributed()
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
