"""Optax optimizer factory with torch-matching update semantics.

The reference builds torch optimizers (``dassl/optim/optimizer.py:88-147``);
the OVMR recipe is plain Adam(lr=2e-4, weight_decay=5e-4). Torch-style weight
decay is L2-added-to-gradient BEFORE the moment updates (not AdamW), so the
chain is add_decayed_weights -> scale_by_adam -> -lr. The learning rate is an
injected hyperparameter set once per epoch (the reference steps its scheduler
per epoch too).
"""

from __future__ import annotations

import optax


def build_optimizer(optim_cfg) -> optax.GradientTransformation:
    name = optim_cfg.NAME
    wd = float(optim_cfg.WEIGHT_DECAY)
    b1, b2 = float(optim_cfg.ADAM_BETA1), float(optim_cfg.ADAM_BETA2)
    mom = float(optim_cfg.MOMENTUM)
    nesterov = bool(optim_cfg.SGD_NESTEROV)
    rms_alpha = float(optim_cfg.RMSPROP_ALPHA)

    if name in ("adam", "amsgrad"):
        def make(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    elif name == "adamw":
        def make(lr):
            # torch AdamW: decoupled decay applied together with lr
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.scale(-lr),
            )

    elif name == "sgd":
        def make(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            if mom > 0:
                parts.append(optax.trace(decay=mom, nesterov=nesterov))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    elif name == "rmsprop":
        def make(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            parts.append(optax.scale_by_rms(decay=rms_alpha, eps=1e-8))
            if mom > 0:
                parts.append(optax.trace(decay=mom))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    else:
        raise ValueError(f"unsupported optimizer {name!r}")

    return optax.inject_hyperparams(make)(lr=float(optim_cfg.LR))


def set_lr(opt_state, lr: float):
    """Update the injected lr hyperparameter (per-epoch stepping)."""
    opt_state.hyperparams["lr"] = lr
    return opt_state
