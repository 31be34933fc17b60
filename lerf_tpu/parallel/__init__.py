"""Parallelism layer: SPMD data-parallel training and spatially-sharded
resampling over a TPU device mesh."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .spatial import (
    imdn_stages_sharded,
    imdn_stages_sharded_exchange,
    lut_stages_sharded,
    sharded_dynamic_sr_pipeline,
    sharded_devgeo_warp_pipeline,
    sharded_dynamic_warp_pipeline,
    sharded_imdn_sr_pipeline,
    sharded_imdn_warp_pipeline,
    sharded_lut_sr_pipeline,
    sharded_lut_warp_pipeline,
    sharded_net_sr_pipeline,
    srnet_stages_sharded,
    steering_gaussian_resize_rings_sharded,
    steering_gaussian_resize_sharded,
    steering_gaussian_warp_rings_sharded,
    steering_gaussian_warp_sharded,
)

__all__ = ["DATA_AXIS", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "replicate",
           "steering_gaussian_resize_sharded",
           "steering_gaussian_warp_sharded",
           "lut_stages_sharded", "sharded_lut_sr_pipeline",
           "sharded_lut_warp_pipeline",
           "steering_gaussian_warp_rings_sharded",
           "sharded_dynamic_warp_pipeline",
           "sharded_devgeo_warp_pipeline",
           "steering_gaussian_resize_rings_sharded",
           "sharded_dynamic_sr_pipeline",
           "srnet_stages_sharded", "sharded_net_sr_pipeline",
           "imdn_stages_sharded", "imdn_stages_sharded_exchange",
           "sharded_imdn_sr_pipeline",
           "sharded_imdn_warp_pipeline"]
