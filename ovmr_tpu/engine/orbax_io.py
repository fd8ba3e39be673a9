"""Orbax checkpoint backend (optional).

The default checkpoint format is path-flattened npz
(:mod:`ovmr_tpu.engine.checkpoint`) — ideal for the 12.6M-param generator.
This module offers Orbax as an alternative for very large or sharded states
(async saves, per-array chunking, multi-host correctness), keeping the same
(params, opt_state, epoch) contract.

Params and optimizer state live in separate sub-checkpoints so a
params-only template can restore a checkpoint that was saved with optimizer
state (inference loads don't need to reconstruct the optax tree).
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Any, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_orbax(directory: str, name: str, epoch: int, params, opt_state=None) -> str:
    """Write ``{directory}/{name}/orbax-{epoch}/{params,opt_state}``."""
    from ovmr_tpu.utils.tools import mkdir_if_missing

    subdir = osp.join(osp.abspath(directory), name)
    mkdir_if_missing(subdir)
    path = osp.join(subdir, f"orbax-{epoch}")
    ckptr = _checkpointer()
    ckptr.save(osp.join(path, "params"), params, force=True)
    if opt_state is not None:
        ckptr.save(osp.join(path, "opt_state"), opt_state, force=True)
    ckptr.wait_until_finished()
    with open(osp.join(path, "meta.json"), "w") as f:
        json.dump({"epoch": int(epoch), "has_opt_state": opt_state is not None}, f)
    with open(osp.join(subdir, "checkpoint_orbax"), "w") as f:
        f.write(osp.basename(path))
    return path


def load_orbax(
    directory: str,
    name: str,
    params_template,
    opt_state_template=None,
    epoch: Optional[int] = None,
) -> Tuple[Any, Any, int]:
    subdir = osp.join(osp.abspath(directory), name)
    if epoch is not None:
        path = osp.join(subdir, f"orbax-{epoch}")
    else:
        pointer = osp.join(subdir, "checkpoint_orbax")
        if not osp.exists(pointer):
            raise FileNotFoundError(f"No orbax pointer at {pointer}")
        with open(pointer) as f:
            path = osp.join(subdir, f.read().strip())
    meta_path = osp.join(path, "meta.json")
    if not osp.exists(meta_path):
        raise FileNotFoundError(f"No orbax checkpoint at {path}")
    with open(meta_path) as f:
        meta = json.load(f)

    ckptr = _checkpointer()
    params = ckptr.restore(osp.join(path, "params"), params_template)
    opt_state = None
    if opt_state_template is not None and meta.get("has_opt_state"):
        opt_state = ckptr.restore(osp.join(path, "opt_state"), opt_state_template)
    return params, opt_state, int(meta["epoch"])
