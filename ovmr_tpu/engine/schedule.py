"""Per-epoch learning-rate schedules.

Closed forms matching the torch scheduler stack the reference uses
(``dassl/optim/lr_scheduler.py:83-152``: cosine / single_step / multi_step,
wrapped by constant or linear warmup). Verified against a torch simulation:
with 1-epoch constant warmup + 30-epoch cosine the sequence is
``[cons, base, 0.5*base*(1+cos(pi*1/30)), ...]`` — i.e. the cosine phase is
indexed by ``epoch - warmup``.
"""

from __future__ import annotations

import math
from typing import Sequence


def lr_for_epoch(
    epoch: int,
    base_lr: float,
    max_epoch: int,
    scheduler: str = "cosine",
    stepsize: Sequence[int] | int = (-1,),
    gamma: float = 0.1,
    warmup_epoch: int = -1,
    warmup_type: str = "linear",
    warmup_cons_lr: float = 1e-5,
    warmup_min_lr: float = 1e-5,
) -> float:
    warmup = max(warmup_epoch, 0)
    if epoch < warmup:
        if warmup_type == "constant":
            return warmup_cons_lr
        if warmup_type == "linear":
            # reference LinearWarmupScheduler: min_lr at epoch 0, then
            # base * epoch / warmup_epoch
            if epoch == 0:
                return warmup_min_lr
            return base_lr * epoch / warmup
        raise ValueError(f"unknown warmup type {warmup_type!r}")

    t = epoch - warmup
    if scheduler == "cosine":
        return 0.5 * base_lr * (1.0 + math.cos(math.pi * t / max_epoch))
    if scheduler == "single_step":
        step = stepsize[-1] if isinstance(stepsize, (list, tuple)) else stepsize
        if step <= 0:
            step = max_epoch
        return base_lr * (gamma ** (t // step))
    if scheduler == "multi_step":
        steps = list(stepsize) if isinstance(stepsize, (list, tuple)) else [stepsize]
        return base_lr * (gamma ** sum(1 for s in steps if t >= s))
    raise ValueError(f"unknown scheduler {scheduler!r}")


def lr_schedule_from_cfg(optim_cfg) -> list:
    """Materialize the whole per-epoch lr table from an OPTIM config node."""
    return [
        lr_for_epoch(
            e,
            base_lr=optim_cfg.LR,
            max_epoch=optim_cfg.MAX_EPOCH,
            scheduler=optim_cfg.LR_SCHEDULER,
            stepsize=optim_cfg.STEPSIZE,
            gamma=optim_cfg.GAMMA,
            warmup_epoch=optim_cfg.WARMUP_EPOCH,
            warmup_type=optim_cfg.WARMUP_TYPE,
            warmup_cons_lr=optim_cfg.WARMUP_CONS_LR,
            warmup_min_lr=optim_cfg.WARMUP_MIN_LR,
        )
        for e in range(optim_cfg.MAX_EPOCH)
    ]
