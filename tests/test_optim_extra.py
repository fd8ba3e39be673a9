"""RAdam / CustomAdam / staged-lr parity.

Goldens in ``tests/fixtures/optim_golden.npz`` are 12-step parameter
trajectories recorded from the REFERENCE optimizers
(``dassl/optim/radam.py``, ``dassl/optim/optimizer.py:152-208`` CustomAdam)
driven by a fixed gradient stream (with zero entries so CustomAdam's
moment masking is exercised)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ovmr_tpu.engine.optimizers import (
    build_optimizer,
    set_lr,
    staged_lr_labels,
)
from ovmr_tpu.utils.defaults import get_cfg_default

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "optim_golden.npz")


def run_trajectory(name, wd, p0, grads, lr=0.01):
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = name
    cfg.OPTIM.LR = lr
    cfg.OPTIM.WEIGHT_DECAY = wd
    opt = build_optimizer(cfg.OPTIM)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    out = []
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        out.append(np.asarray(params["w"]))
    return np.stack(out)


# torch computes the RAdam rectifier scalars in python float64; the traced
# version is fp32, so trajectories drift at the ~1e-4-relative level over
# 12 steps — semantics (branch switches, decay placement) are exact.
def test_radam_matches_reference():
    data = np.load(FIXTURE)
    traj = run_trajectory("radam", 5e-4, data["p0"], data["grads"])
    np.testing.assert_allclose(traj, data["radam"], atol=2e-5, rtol=5e-4)


def test_radam_nodecay_matches_reference():
    data = np.load(FIXTURE)
    traj = run_trajectory("radam", 0.0, data["p0"], data["grads"])
    np.testing.assert_allclose(traj, data["radam_nodecay"], atol=2e-5, rtol=5e-4)


def test_custom_adam_matches_reference():
    data = np.load(FIXTURE)
    traj = run_trajectory("custom_adam", 5e-4, data["p0"], data["grads"])
    np.testing.assert_allclose(traj, data["custom_adam"], atol=2e-6, rtol=2e-6)


def test_amsgrad_matches_torch():
    """12-step amsgrad trajectory vs live torch.optim.Adam(amsgrad=True)
    (reference ``optimizer.py:96-103``): torch maxes the RAW second moment
    and bias-corrects the max afterwards; optax.scale_by_amsgrad maxes the
    bias-corrected moment (holds inflated early values) — not equivalent,
    so build_optimizer ships the torch-exact transform."""
    import torch

    rng = np.random.default_rng(7)
    p0 = rng.standard_normal(16).astype(np.float32)
    # large first grads then small: the raw-vs-corrected max ordering
    # difference shows up as soon as nu_hat's early inflation would win
    grads = rng.standard_normal((12, 16)).astype(np.float32)
    grads[0] *= 4.0
    lr, wd = 0.01, 5e-4

    p_t = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt_t = torch.optim.Adam(
        [p_t], lr=lr, weight_decay=wd, amsgrad=True
    )
    traj_t = []
    for g in grads:
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        traj_t.append(p_t.detach().numpy().copy())

    traj = run_trajectory("amsgrad", wd, p0, grads, lr=lr)
    np.testing.assert_allclose(traj, np.stack(traj_t), atol=2e-6)


def test_rmsprop_matches_torch():
    """12-step rmsprop trajectory vs live torch.optim.RMSprop (reference
    ``optimizer.py:116-122``): coupled wd enters the square-average, eps is
    added OUTSIDE the root (optax's default eps_in_sqrt=True diverges at the
    1e-3 level within a few steps), momentum buffers the rescaled grad."""
    import torch

    rng = np.random.default_rng(5)
    p0 = rng.standard_normal(16).astype(np.float32)
    grads = rng.standard_normal((12, 16)).astype(np.float32) * 0.3
    lr, wd, mom, alpha = 0.01, 5e-4, 0.9, 0.99

    p_t = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt_t = torch.optim.RMSprop(
        [p_t], lr=lr, momentum=mom, weight_decay=wd, alpha=alpha
    )
    traj_t = []
    for g in grads:
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        traj_t.append(p_t.detach().numpy().copy())

    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "rmsprop"
    cfg.OPTIM.LR = lr
    cfg.OPTIM.WEIGHT_DECAY = wd
    cfg.OPTIM.MOMENTUM = mom
    cfg.OPTIM.RMSPROP_ALPHA = alpha
    opt = build_optimizer(cfg.OPTIM)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    traj = []
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        traj.append(np.asarray(params["w"]))

    np.testing.assert_allclose(np.stack(traj), np.stack(traj_t), atol=2e-6)


def test_staged_lr_param_groups():
    """NEW_LAYERS params step at LR, the rest at LR*BASE_LR_MULT
    (reference ``optimizer.py:46-80``)."""
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.WEIGHT_DECAY = 0.0
    cfg.OPTIM.MOMENTUM = 0.0
    cfg.OPTIM.STAGED_LR = True
    cfg.OPTIM.NEW_LAYERS = ("head",)
    cfg.OPTIM.BASE_LR_MULT = 0.1

    params = {
        "backbone": {"w": jnp.ones((3,))},
        "head": {"w": jnp.ones((3,))},
    }
    labels = staged_lr_labels(params, cfg.OPTIM.NEW_LAYERS)
    opt = build_optimizer(cfg.OPTIM, staged_labels=labels)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["backbone"]["w"]), -0.01, rtol=1e-6
    )

    # per-epoch lr stepping still reaches both groups
    state = set_lr(state, 0.05)
    updates, state = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -0.05, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["backbone"]["w"]), -0.005, rtol=1e-6
    )


def test_staged_lr_requires_labels():
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.STAGED_LR = True
    try:
        build_optimizer(cfg.OPTIM)
    except ValueError as e:
        assert "staged" in str(e).lower()
    else:
        raise AssertionError("expected ValueError without staged labels")
