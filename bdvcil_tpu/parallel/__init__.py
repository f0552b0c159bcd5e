from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from .distributed import (
    initialize,
    is_primary,
    all_gather_host,
    sync_processes,
    process_count,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "initialize",
    "is_primary",
    "all_gather_host",
    "sync_processes",
    "process_count",
]
