"""Device mesh + sharding policy.

The TPU-native replacement for the reference's only parallelism —
single-process ``nn.DataParallel`` over visible GPUs
(``trainers/mm_classifier_one_prompt.py:414-419``):

- one ``jax.sharding.Mesh`` over ('data', 'model') axes; batch dims shard
  over 'data' (ICI all-reduce of grads/loss is emitted by XLA instead of the
  reference's loss-sum-over-replicas), parameters replicate;
- 'model' is plumbed (size 1 for ViT-B, which fits one chip) so larger
  towers can shard without API changes;
- multi-host (one process per pod host): after
  ``multihost.maybe_initialize_distributed()`` the same mesh spans every
  process's devices and every placement helper below assembles GLOBAL
  arrays from host values via ``jax.make_array_from_callback`` (each
  process materializes only its addressable shards). The feeding contract
  is that every process holds the identical host value (loaders are
  seeded by ``cfg.SEED``, params by the same PRNGKey), so nothing above
  this module changes; ``to_host`` gathers sharded results back
  (process_allgather) for host-side evaluation.
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


def from_host(x, sharding: NamedSharding) -> jax.Array:
    """Place a host value that EVERY process holds identically onto a
    (possibly multi-process) sharding. Single-process: plain device_put.
    Multi-process: assemble the global array shard-by-shard — device_put
    would fail on non-addressable devices."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def to_host(x) -> np.ndarray:
    """Fetch a (possibly cross-process-sharded) array to every host.
    Single-process (or fully-replicated): plain np.asarray."""
    if jax.process_count() == 1 or x.is_fully_replicated:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x: jax.Array, axis: int = 0) -> jax.Array:
    return from_host(x, batch_sharding(mesh, np.ndim(x), axis))


def place_local_batch(mesh, *arrays, axis: int = 0):
    """Guarded placement for sliced-loader batches (each array holds only
    THIS process's rows). One shared guard — a sliced batch without a
    mesh cannot be assembled and must fail loudly."""
    if mesh is None:
        raise RuntimeError(
            "sliced multi-host batch without a mesh — set TPU.MESH.DATA "
            "!= 1 or disable TPU.MULTIHOST_SLICED_LOADER"
        )
    return tuple(shard_batch_local(mesh, a, axis) for a in arrays)


def shard_batch_local(mesh: Mesh, x, axis: int = 0) -> jax.Array:
    """Assemble a GLOBAL batch from this process's LOCAL rows (the
    per-host sliced-loader contract: each host decodes only its
    contiguous block of the identically-seeded global batch).
    Single-process: plain :func:`shard_batch`."""
    if jax.process_count() == 1:
        return shard_batch(mesh, x, axis)
    x = np.asarray(x)
    sharding = batch_sharding(mesh, x.ndim, axis)
    gshape = list(x.shape)
    gshape[axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, x, tuple(gshape)
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: from_host(x, sharding), tree)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def tower_param_shardings(mesh: Mesh, params):
    """Tensor-parallel shardings for CLIP tower params over the 'model'
    axis (Megatron-style MLP split: c_fc column-parallel, c_proj
    row-parallel; XLA/GSPMD inserts the reduce automatically). Everything
    else replicates, so with model=1 this is plain replication.

    Block leaf layouts (see ``models/import_torch._blocks_from_sd``):
      c_fc_w [L, D, 4D] -> shard 4D;  c_fc_b [L, 4D] -> shard 4D;
      c_proj_w [L, 4D, D] -> shard 4D (contracted dim, row-parallel).
    """
    msize = mesh.shape["model"]

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if msize > 1 and hasattr(leaf, "shape"):
            if name == "c_fc_w" and leaf.shape[-1] % msize == 0:
                return NamedSharding(mesh, P(None, None, "model"))
            if name == "c_fc_b" and leaf.shape[-1] % msize == 0:
                return NamedSharding(mesh, P(None, "model"))
            if name == "c_proj_w" and leaf.shape[1] % msize == 0:
                return NamedSharding(mesh, P(None, "model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_tower_params(mesh: Mesh, params):
    """Place CLIP tower params with :func:`tower_param_shardings`
    (multi-process aware — every process holds the full host copy)."""
    shardings = tower_param_shardings(mesh, params)
    return jax.tree_util.tree_map(from_host, params, shardings)
