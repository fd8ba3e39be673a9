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


# packed-qkv (legacy GSPMD-only TP) shards only the Megatron MLP split;
# the split-qkv TP-pallas layout shards every block matmul
_PACKED_TP_NAMES = ("c_fc_w", "c_fc_b", "c_proj_w")


def _is_split_layout(params) -> bool:
    """True when the tree carries split-qkv blocks (TP-pallas layout)."""
    found = [False]

    def look(path, leaf):
        if getattr(path[-1], "key", None) == "w_q":
            found[0] = True
        return leaf

    jax.tree_util.tree_map_with_path(look, params)
    return found[0]


def _tp_pspec(path, leaf, msize, split: bool) -> P:
    """'model'-axis PartitionSpec for one tower leaf, by name.

    Split-qkv layout (TP-pallas route, ``ops.block_fused_tp.TP_BLOCK_AXES``):
    w_q/w_k/w_v column shards, w_out/c_proj_w row shards, c_fc column,
    biases with their producing matmul; packed layout (legacy GSPMD-only
    route) keeps the Megatron MLP-only split."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if msize <= 1 or not hasattr(leaf, "shape"):
        return P()
    if not split and name not in _PACKED_TP_NAMES:
        return P()
    from ovmr_tpu.ops.block_fused_tp import TP_BLOCK_AXES

    if name in TP_BLOCK_AXES and any(
        getattr(p, "key", None) == "blocks" for p in path
    ):
        axis = TP_BLOCK_AXES[name]
        if axis is None:
            return P()
        # leading dim is the stacked layer axis
        dim = 1 + axis
        if leaf.shape[dim] % msize == 0:
            spec = [None] * leaf.ndim
            spec[dim] = "model"
            return P(*spec)
    return P()


def clip_pspecs(params, msize: int):
    """PartitionSpec pytree for CLIP params (shard_map in_specs): split-qkv
    block leaves shard over 'model' per ``_tp_pspec``; everything else
    replicates (over the MANUAL axes — 'data'-sharded batch args are the
    caller's separate specs)."""
    split = _is_split_layout(params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _tp_pspec(path, leaf, msize, split), params
    )


def tower_param_shardings(mesh: Mesh, params):
    """Tensor-parallel shardings for CLIP tower params over the 'model'
    axis. Split-qkv trees (TP-pallas route) shard per
    ``ops.block_fused_tp.TP_BLOCK_AXES``; packed trees keep the
    Megatron-style MLP-only split (c_fc column-parallel, c_proj
    row-parallel; XLA/GSPMD inserts the reduce automatically). Everything
    else replicates, so with model=1 this is plain replication.

    Block leaf layouts (see ``models/import_torch._blocks_from_sd``):
      c_fc_w [L, D, 4D] -> shard 4D;  c_fc_b [L, 4D] -> shard 4D;
      c_proj_w [L, 4D, D] -> shard 4D (contracted dim, row-parallel).
    """
    msize = mesh.shape["model"]
    split = _is_split_layout(params)

    def spec_for(path, leaf):
        return NamedSharding(mesh, _tp_pspec(path, leaf, msize, split))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_tower_params(mesh: Mesh, params):
    """Place CLIP tower params with :func:`tower_param_shardings`
    (multi-process aware — every process holds the full host copy)."""
    shardings = tower_param_shardings(mesh, params)
    return jax.tree_util.tree_map(from_host, params, shardings)
