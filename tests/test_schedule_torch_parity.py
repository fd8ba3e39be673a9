"""Per-epoch lr table vs the ACTUAL reference torch scheduler stack.

Rebuilds the reference wrapper classes verbatim-in-behavior
(``dassl/optim/lr_scheduler.py:10-152``: Constant/Linear warmup around
cosine / single_step / multi_step, incl. the WARMUP_RECOUNT=False
``successor.last_epoch = warmup_epoch`` preset at :135-137) and steps them
exactly like the reference trainer does (``update_lr`` once per epoch after
the last batch, ``dassl/engine/trainer.py:229-234``), comparing the lr the
optimizer would USE each epoch against ``lr_for_epoch`` over the full grid.

This is the composition test VERDICT r4 asked for on the schedule side: the
recursive torch ``get_lr`` chaining through a preset ``last_epoch`` is NOT
the closed form one would naively write (see schedule.py docstring).
"""

import warnings

import pytest

torch = pytest.importorskip("torch")

from torch.optim.lr_scheduler import (  # noqa: E402
    CosineAnnealingLR,
    MultiStepLR,
    StepLR,
    _LRScheduler,
)

from ovmr_tpu.engine.schedule import lr_for_epoch  # noqa: E402

pytestmark = pytest.mark.quick


class _BaseWarmupScheduler(_LRScheduler):
    # mirrors dassl/optim/lr_scheduler.py:11-34
    def __init__(self, optimizer, successor, warmup_epoch, last_epoch=-1):
        self.successor = successor
        self.warmup_epoch = warmup_epoch
        super().__init__(optimizer, last_epoch)

    def get_lr(self):
        raise NotImplementedError

    def step(self, epoch=None):
        if self.last_epoch >= self.warmup_epoch:
            self.successor.step(epoch)
            self._last_lr = self.successor.get_last_lr()
        else:
            super().step(epoch)


class ConstantWarmupScheduler(_BaseWarmupScheduler):
    # dassl/optim/lr_scheduler.py:37-55
    def __init__(self, optimizer, successor, warmup_epoch, cons_lr):
        self.cons_lr = cons_lr
        super().__init__(optimizer, successor, warmup_epoch)

    def get_lr(self):
        if self.last_epoch >= self.warmup_epoch:
            return self.successor.get_last_lr()
        return [self.cons_lr for _ in self.base_lrs]


class LinearWarmupScheduler(_BaseWarmupScheduler):
    # dassl/optim/lr_scheduler.py:58-81
    def __init__(self, optimizer, successor, warmup_epoch, min_lr):
        self.min_lr = min_lr
        super().__init__(optimizer, successor, warmup_epoch)

    def get_lr(self):
        if self.last_epoch >= self.warmup_epoch:
            return self.successor.get_last_lr()
        if self.last_epoch == 0:
            return [self.min_lr for _ in self.base_lrs]
        return [lr * self.last_epoch / self.warmup_epoch for lr in self.base_lrs]


BASE, CONS, GAMMA = 2e-4, 1e-5, 0.1
STEPSIZE, MILESTONES = 5, (3, 6)


def torch_lr_sequence(scheduler, max_epoch, warmup, warmup_type, recount):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=BASE)
    if scheduler == "cosine":
        sched = CosineAnnealingLR(opt, float(max_epoch))
    elif scheduler == "single_step":
        sched = StepLR(opt, step_size=STEPSIZE, gamma=GAMMA)
    else:
        sched = MultiStepLR(opt, milestones=list(MILESTONES), gamma=GAMMA)
    if warmup > 0:
        # reference build_lr_scheduler:135-150
        if not recount:
            sched.last_epoch = warmup
        cls = (
            ConstantWarmupScheduler
            if warmup_type == "constant"
            else LinearWarmupScheduler
        )
        sched = cls(opt, sched, warmup, CONS)
    lrs = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # torch's step-order UserWarning
        for _ in range(max_epoch):
            lrs.append(opt.param_groups[0]["lr"])
            sched.step()  # update_lr() at the end of every epoch
    return lrs


@pytest.mark.parametrize("scheduler", ["cosine", "single_step", "multi_step"])
@pytest.mark.parametrize("recount", [True, False])
@pytest.mark.parametrize("warmup_type", ["constant", "linear"])
@pytest.mark.parametrize("max_epoch,warmup", [(3, 1), (10, 1), (30, 1), (12, 3), (10, 0)])
def test_lr_table_matches_torch(scheduler, recount, warmup_type, max_epoch, warmup):
    ref = torch_lr_sequence(scheduler, max_epoch, warmup, warmup_type, recount)
    ours = [
        lr_for_epoch(
            e,
            BASE,
            max_epoch,
            scheduler=scheduler,
            stepsize=(STEPSIZE,) if scheduler == "single_step" else MILESTONES,
            gamma=GAMMA,
            warmup_epoch=warmup,
            warmup_type=warmup_type,
            warmup_cons_lr=CONS,
            warmup_min_lr=CONS,
            warmup_recount=recount,
        )
        for e in range(max_epoch)
    ]
    for e, (a, b) in enumerate(zip(ref, ours)):
        assert a == pytest.approx(b, rel=1e-9), (
            f"epoch {e}: torch={a!r} ours={b!r} "
            f"({scheduler}, recount={recount}, {warmup_type}, "
            f"T={max_epoch}, w={warmup})"
        )
