from .mesh import (
    batch_sharding,
    clip_pspecs,
    build_mesh,
    from_host,
    pad_to_multiple,
    place_local_batch,
    place_tower_params,
    replicate,
    replicated,
    shard_batch,
    shard_batch_local,
    to_host,
    tower_param_shardings,
)
from .multihost import is_primary, maybe_initialize_distributed

__all__ = [
    "batch_sharding",
    "clip_pspecs",
    "build_mesh",
    "from_host",
    "is_primary",
    "maybe_initialize_distributed",
    "pad_to_multiple",
    "place_local_batch",
    "place_tower_params",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_batch_local",
    "to_host",
    "tower_param_shardings",
]
