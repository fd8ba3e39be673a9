"""Optax optimizer factory with torch-matching update semantics.

The reference builds torch optimizers (``dassl/optim/optimizer.py:88-147``);
the OVMR recipe is plain Adam(lr=2e-4, weight_decay=5e-4). Torch-style weight
decay is L2-added-to-gradient BEFORE the moment updates (not AdamW), so the
chain is add_decayed_weights -> scale_by_adam -> -lr. The learning rate is an
injected hyperparameter set once per epoch (the reference steps its scheduler
per epoch too).

Also provided, matching the rest of the reference surface:
- ``radam``: the Liu et al. rectified Adam exactly as vendored in
  ``dassl/optim/radam.py`` (decoupled lr-scaled decay, degenerated-to-SGD
  warmup steps, rectified denominator);
- ``custom_adam``: the reference's masked Adam variant
  (``dassl/optim/optimizer.py:152-208``) — moments update only where the
  (L2-decayed) gradient is nonzero, the step itself applies everywhere;
- staged-lr param groups (``dassl/optim/optimizer.py:46-80``): leaves under
  NEW_LAYERS top-level keys train at LR, the rest at LR*BASE_LR_MULT.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class _MomentState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


class _AmsgradState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad_torch(
    b1: float, b2: float, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Torch-semantics AMSGrad update (pre-lr; chain with ``optax.scale(-lr)``).

    Torch ``Adam(amsgrad=True)`` maxes the RAW second moment and
    bias-corrects the max afterwards (``max_exp_avg_sq = max(.., v_t)``;
    ``denom = sqrt(max)/sqrt(1-b2^t) + eps``). ``optax.scale_by_amsgrad``
    instead maxes the bias-CORRECTED moment, which holds onto inflated
    early-step values — not equivalent."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _AmsgradState(
            count=jnp.zeros([], jnp.int32), mu=z, nu=z, nu_max=z
        )

    def update(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates
        )
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1**tf
        bc2_sqrt = jnp.sqrt(1 - b2**tf)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / bc2_sqrt + eps),
            mu,
            nu_max,
        )
        return new_updates, _AmsgradState(count=t, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init, update)


def scale_by_radam_torch(
    b1: float,
    b2: float,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    degenerated_to_sgd: bool = True,
) -> optax.GradientTransformation:
    """Torch-semantics RAdam update (pre-lr; chain with ``optax.scale(-lr)``).

    Mirrors ``dassl/optim/radam.py:50-130``: plain EMA moments, per-step
    rectification term N_sma; N_sma>=5 -> rectified adaptive step,
    otherwise an SGD step on the first moment (or a ZERO step, decay
    included, when ``degenerated_to_sgd`` is off — the reference skips the
    whole update in that branch)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _MomentState(count=jnp.zeros([], jnp.int32), mu=z, nu=z)

    def update(updates, state, params):
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates
        )
        t = state.count + 1
        tf = t.astype(jnp.float32)
        beta2_t = b2**tf
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / (1.0 - beta2_t)

        rect = jnp.sqrt(
            (1 - beta2_t)
            * (n_sma - 4)
            / (n_sma_max - 4)
            * (n_sma - 2)
            / n_sma
            * n_sma_max
            / (n_sma_max - 2)
        ) / (1 - b1**tf)
        sgd_step = (
            1.0 / (1 - b1**tf) if degenerated_to_sgd else jnp.float32(0.0)
        )
        use_rect = n_sma >= 5.0
        # decay is decoupled and lr-scaled in the reference; it is skipped
        # entirely on zero-step (non-degenerated) iterations
        decay_on = jnp.where(
            use_rect, 1.0, jnp.where(sgd_step > 0, 1.0, 0.0)
        ) * weight_decay

        def leaf(m, v, p):
            rect_upd = rect * m / (jnp.sqrt(v) + eps)
            sgd_upd = sgd_step * m
            out = jnp.where(use_rect, rect_upd, sgd_upd)
            if params is not None:
                out = out + decay_on * p
            return out

        new_updates = jax.tree_util.tree_map(
            leaf, mu, nu, params if params is not None else mu
        )
        return new_updates, _MomentState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def scale_by_custom_adam(
    b1: float, b2: float, eps: float = 1e-8, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Torch-semantics CustomAdam (``dassl/optim/optimizer.py:152-208``),
    pre-lr. L2 decay folds into the gradient first; moment EMAs update only
    where that decayed gradient is nonzero; the returned step
    sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v)+eps) applies to every entry."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _MomentState(count=jnp.zeros([], jnp.int32), mu=z, nu=z)

    def update(updates, state, params):
        if weight_decay != 0 and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        t = state.count + 1
        tf = t.astype(jnp.float32)

        mu = jax.tree_util.tree_map(
            lambda m, g: jnp.where(g != 0, b1 * m + (1 - b1) * g, m),
            state.mu,
            updates,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: jnp.where(g != 0, b2 * v + (1 - b2) * g * g, v),
            state.nu,
            updates,
        )
        factor = jnp.sqrt(1 - b2**tf) / (1 - b1**tf)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: factor * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return new_updates, _MomentState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def staged_lr_labels(params, new_layers) -> Optional[dict]:
    """Label pytree for staged-lr: leaves under a top-level key named in
    ``new_layers`` -> "new", everything else -> "base" (the reference splits
    by ``model.named_children()``, ``optimizer.py:60-75``)."""
    new = set([new_layers] if isinstance(new_layers, str) else new_layers or [])
    if not new:
        return None
    return {
        k: jax.tree_util.tree_map(lambda _: "new" if k in new else "base", v)
        for k, v in params.items()
    }


def build_optimizer(
    optim_cfg, staged_labels=None
) -> optax.GradientTransformation:
    name = optim_cfg.NAME
    wd = float(optim_cfg.WEIGHT_DECAY)
    b1, b2 = float(optim_cfg.ADAM_BETA1), float(optim_cfg.ADAM_BETA2)
    mom = float(optim_cfg.MOMENTUM)
    nesterov = bool(optim_cfg.SGD_NESTEROV)
    rms_alpha = float(optim_cfg.RMSPROP_ALPHA)
    base_lr_mult = float(optim_cfg.BASE_LR_MULT)
    if bool(optim_cfg.STAGED_LR) and staged_labels is None:
        staged_labels = "MISSING"

    if name in ("adam", "amsgrad"):
        def chain_for(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            if name == "amsgrad":
                # torch Adam(amsgrad=True) (reference optimizer.py:96-103)
                parts.append(scale_by_amsgrad_torch(b1=b1, b2=b2))
            else:
                parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    elif name == "adamw":
        def chain_for(lr):
            # torch AdamW: decoupled decay applied together with lr
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.scale(-lr),
            )

    elif name == "sgd":
        def chain_for(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            if mom > 0:
                parts.append(optax.trace(decay=mom, nesterov=nesterov))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    elif name == "rmsprop":
        def chain_for(lr):
            parts = [optax.add_decayed_weights(wd)] if wd > 0 else []
            # torch RMSprop (reference optimizer.py:116-122): denom =
            # sqrt(nu) + eps, eps OUTSIDE the root; optax defaults to
            # eps_in_sqrt=True
            parts.append(
                optax.scale_by_rms(
                    decay=rms_alpha, eps=1e-8, eps_in_sqrt=False
                )
            )
            if mom > 0:
                parts.append(optax.trace(decay=mom))
            parts.append(optax.scale(-lr))
            return optax.chain(*parts)

    elif name == "radam":
        def chain_for(lr):
            return optax.chain(
                scale_by_radam_torch(b1, b2, weight_decay=wd), optax.scale(-lr)
            )

    elif name == "custom_adam":
        def chain_for(lr):
            return optax.chain(
                scale_by_custom_adam(b1, b2, weight_decay=wd), optax.scale(-lr)
            )

    else:
        raise ValueError(f"unsupported optimizer {name!r}")

    if staged_labels is None:
        make = chain_for
    elif staged_labels == "MISSING":
        raise ValueError(
            "OPTIM.STAGED_LR requires staged_labels "
            "(build with staged_lr_labels(params, cfg.OPTIM.NEW_LAYERS))"
        )
    else:
        def make(lr):
            return optax.multi_transform(
                {"base": chain_for(lr * base_lr_mult), "new": chain_for(lr)},
                staged_labels,
            )

    return optax.inject_hyperparams(make)(lr=float(optim_cfg.LR))


def set_lr(opt_state, lr: float):
    """Update the injected lr hyperparameter (per-epoch stepping)."""
    opt_state.hyperparams["lr"] = lr
    return opt_state
