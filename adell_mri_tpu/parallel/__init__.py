from adell_mri_tpu.parallel.mesh import (
    get_devices,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
    local_device_count,
)

__all__ = [
    "get_devices",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "local_device_count",
]
