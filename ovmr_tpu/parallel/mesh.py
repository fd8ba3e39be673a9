"""Device mesh + sharding policy.

The TPU-native replacement for the reference's only parallelism —
single-process ``nn.DataParallel`` over visible GPUs
(``trainers/mm_classifier_one_prompt.py:414-419``):

- one ``jax.sharding.Mesh`` over ('data', 'model') axes; batch dims shard
  over 'data' (ICI all-reduce of grads/loss is emitted by XLA instead of the
  reference's loss-sum-over-replicas), parameters replicate;
- 'model' is plumbed (size 1 for ViT-B, which fits one chip) so larger
  towers can shard without API changes;
- DCN multi-slice would add an outer axis to the same mesh; nothing below
  this module would change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev_array = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x: jax.Array, axis: int = 0) -> jax.Array:
    return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
