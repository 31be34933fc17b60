"""Parallelism layer: SPMD data-parallel training over a TPU device mesh."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "replicate"]
