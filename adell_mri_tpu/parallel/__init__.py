from adell_mri_tpu.parallel.mesh import (
    get_devices,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
    local_device_count,
)
from adell_mri_tpu.parallel.pipeline import pipeline_apply, stack_stage_params
from adell_mri_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    shard_pids_for_host,
)

__all__ = [
    "get_devices",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "local_device_count",
    "pipeline_apply",
    "stack_stage_params",
    "maybe_initialize_distributed",
    "shard_pids_for_host",
]
