from .mesh import (
    batch_sharding,
    build_mesh,
    pad_to_multiple,
    place_tower_params,
    replicate,
    replicated,
    shard_batch,
    tower_param_shardings,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "pad_to_multiple",
    "place_tower_params",
    "replicate",
    "replicated",
    "shard_batch",
    "tower_param_shardings",
]
