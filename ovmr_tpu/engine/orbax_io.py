"""Orbax checkpoint backend (optional).

The default checkpoint format is path-flattened npz
(:mod:`ovmr_tpu.engine.checkpoint`) — ideal for the 12.6M-param generator.
This module offers Orbax as an alternative for very large or sharded states
(async saves, per-array chunking, multi-host correctness), keeping the same
(params, opt_state, epoch) contract.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_orbax(directory: str, name: str, epoch: int, params, opt_state=None) -> str:
    """Write ``{directory}/{name}/orbax-{epoch}`` and a pointer file."""
    from ovmr_tpu.utils.tools import mkdir_if_missing

    subdir = osp.join(osp.abspath(directory), name)
    mkdir_if_missing(subdir)
    path = osp.join(subdir, f"orbax-{epoch}")
    payload = {"params": params, "epoch": epoch}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
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
    template = {"params": params_template, "epoch": 0}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    restored = _checkpointer().restore(path, template)
    return (
        restored["params"],
        restored.get("opt_state"),
        int(restored["epoch"]),
    )
