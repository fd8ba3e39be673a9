from .mesh import (
    batch_sharding,
    build_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
