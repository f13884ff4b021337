from dpfx.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from dpfx.parallel.distributed import (
    global_batch,
    initialize_distributed,
    initialize_from_config,
    process_local_rows,
    shard_resident_stack,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "global_batch",
    "initialize_distributed",
    "initialize_from_config",
    "process_local_rows",
    "shard_resident_stack",
]
