from .optimizers import build_optimizer, set_lr


def register_all_trainers():
    """Import every trainer module so TRAINER_REGISTRY is fully populated."""
    from . import coop, trainer, zsclip  # noqa: F401
    from . import da, dg, ssl  # noqa: F401  (DA/DG/SSL families)

from .schedule import lr_for_epoch, lr_schedule_from_cfg
from .train_step import make_train_step, sample_split_point

__all__ = [
    "build_optimizer",
    "set_lr",
    "lr_for_epoch",
    "lr_schedule_from_cfg",
    "make_train_step",
    "sample_split_point",
]
