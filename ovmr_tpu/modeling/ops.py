"""Functional modeling ops (reference ``dassl/modeling/ops/``).

The reference ships these as torch ``nn.Module``s / autograd Functions;
here every op is a pure JAX function over explicit inputs + PRNG keys so
they compose under ``jit``/``grad``/``vmap`` and run on the TPU without
host round-trips. Feature maps are NHWC (the TPU-native conv layout used
throughout ``ovmr_tpu.modeling``); the reference's NCHW semantics map
1:1 (statistics over the spatial axes).

Op -> reference file map:
- ``reverse_grad``            ops/reverse_grad.py (autograd Function)
- ``cross_entropy``           ops/cross_entropy.py
- ``mixup``                   ops/mixup.py
- ``mixstyle``                ops/mixstyle.py (MixStyle, ICLR'21)
- ``efdmix``                  ops/efdmix.py (EFDMix, CVPR'22)
- ``mmd``                     ops/mmd.py (MaximumMeanDiscrepancy)
- ``sinkhorn_divergence`` / ``minibatch_energy_distance``
                              ops/optimal_transport.py
- ``sharpen_prob``/``create_onehot``/``*_rampup``/``ema_update``
                              ops/utils.py
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "reverse_grad",
    "cross_entropy",
    "mixup",
    "mixstyle",
    "efdmix",
    "mmd",
    "sinkhorn_divergence",
    "minibatch_energy_distance",
    "sharpen_prob",
    "create_onehot",
    "sigmoid_rampup",
    "linear_rampup",
    "ema_update",
]


# ---------------------------------------------------------------------------
# gradient reversal (reference ops/reverse_grad.py)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _reverse_grad(x, grad_scaling):
    return x


def _reverse_fwd(x, grad_scaling):
    return x, grad_scaling


def _reverse_bwd(grad_scaling, g):
    return (-grad_scaling * g, None)


_reverse_grad.defvjp(_reverse_fwd, _reverse_bwd)


def reverse_grad(x, grad_scaling=1.0):
    """Identity in the forward; scales the cotangent by ``-grad_scaling``
    in the backward (the GRL of DANN/MME). ``grad_scaling`` may be a
    traced scalar (DANN anneals it per step); the sign check only applies
    to concrete values."""
    if isinstance(grad_scaling, (int, float)) and grad_scaling < 0:
        raise ValueError(
            f"grad_scaling must be non-negative, but got {grad_scaling}"
        )
    return _reverse_grad(x, grad_scaling)


# ---------------------------------------------------------------------------
# losses / label utilities
# ---------------------------------------------------------------------------

def cross_entropy(logits, label, label_smooth: float = 0.0, reduction="mean"):
    """Label-smoothed cross entropy over ``[B, C]`` logits and int labels
    (reference ops/cross_entropy.py)."""
    num_classes = logits.shape[1]
    log_prob = jax.nn.log_softmax(logits, axis=1)
    target = jax.nn.one_hot(label, num_classes, dtype=logits.dtype)
    target = (1.0 - label_smooth) * target + label_smooth / num_classes
    loss = -(target * log_prob).sum(axis=1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(reduction)


def create_onehot(label, num_classes: int):
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)


def sharpen_prob(p, temperature: float = 2.0):
    """Temperature sharpening of a ``[B, C]`` probability matrix."""
    p = p ** temperature
    return p / p.sum(axis=1, keepdims=True)


def sigmoid_rampup(current, rampup_length: int) -> float:
    """exp(-5(1-t)^2) ramp (host-side schedule scalar)."""
    assert rampup_length > 0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current, rampup_length: int) -> float:
    assert rampup_length > 0
    return float(np.clip(current / rampup_length, 0.0, 1.0))


def ema_update(ema_tree, tree, alpha: float):
    """``ema = alpha * ema + (1-alpha) * new`` over matching pytrees
    (reference ops/utils.py::ema_model_update)."""
    return jax.tree_util.tree_map(
        lambda e, p: alpha * e + (1.0 - alpha) * p, ema_tree, tree
    )


def mixup(x1, x2, y1, y2, beta: float, rng, preserve_order: bool = False,
          lam=None):
    """Beta-interpolated inputs + one-hot labels. ``x*`` are image batches
    (any layout, batch-leading), ``y*`` are ``[B, C]`` one-hots. Pass
    ``lam`` ([B], preserve_order already applied) to use externally drawn
    coefficients — the trajectory-parity tests inject the reference
    torch draws through it."""
    b = x1.shape[0]
    if lam is None:
        lmda = jax.random.beta(rng, beta, beta, (b,))
        if preserve_order:
            lmda = jnp.maximum(lmda, 1.0 - lmda)
    else:
        lmda = lam
    lx = lmda.reshape((b,) + (1,) * (x1.ndim - 1))
    xmix = x1 * lx + x2 * (1.0 - lx)
    ly = lmda.reshape(b, 1)
    ymix = y1 * ly + y2 * (1.0 - ly)
    return xmix, ymix


# ---------------------------------------------------------------------------
# feature-statistics mixing (MixStyle / EFDMix) — NHWC
# ---------------------------------------------------------------------------

def _mix_permutation(rng, batch: int, mix: str):
    """Batch permutation used by both MixStyle and EFDMix: ``random`` is a
    full shuffle; ``crossdomain`` reverses the batch (so the two domain
    halves swap) and shuffles within each half."""
    if mix == "random":
        return jax.random.permutation(rng, batch)
    if mix == "crossdomain":
        perm = jnp.arange(batch - 1, -1, -1)
        half = batch // 2
        k1, k2 = jax.random.split(rng)
        perm_b = jax.random.permutation(k1, perm[:half])
        perm_a = jax.random.permutation(k2, perm[half:])
        return jnp.concatenate([perm_b, perm_a], axis=0)
    raise NotImplementedError(mix)


def mixstyle(
    x,
    rng,
    p: float = 0.5,
    alpha: float = 0.1,
    eps: float = 1e-6,
    mix: str = "random",
    train: bool = True,
):
    """MixStyle on an NHWC feature map: renormalize each sample's
    channel statistics to a Beta-mixed combination of its own and a
    permuted partner's (statistics detached, as in the reference)."""
    if not train or p <= 0:
        return x
    b = x.shape[0]
    k_apply, k_lmda, k_perm = jax.random.split(rng, 3)

    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), ddof=1, keepdims=True)
    sig = jnp.sqrt(var + eps)
    mu = jax.lax.stop_gradient(mu)
    sig = jax.lax.stop_gradient(sig)
    x_normed = (x - mu) / sig

    lmda = jax.random.beta(k_lmda, alpha, alpha, (b, 1, 1, 1)).astype(x.dtype)
    perm = _mix_permutation(k_perm, b, mix)
    mu_mix = mu * lmda + mu[perm] * (1.0 - lmda)
    sig_mix = sig * lmda + sig[perm] * (1.0 - lmda)
    mixed = x_normed * sig_mix + mu_mix

    # the reference skips the whole batch with prob 1-p (one coin per call)
    apply = jax.random.bernoulli(k_apply, p)
    return jnp.where(apply, mixed, x)


def efdmix(
    x,
    rng,
    p: float = 0.5,
    alpha: float = 0.1,
    mix: str = "random",
    train: bool = True,
):
    """EFDMix on an NHWC feature map: exact (sorted) feature distribution
    matching between each sample and a permuted partner, interpolated by a
    Beta draw. Gradients flow to both samples through the sort/gather,
    matching the reference's ``x + (x_copy - x.detach()) * (1-lmda)``."""
    if not train or p <= 0:
        return x
    b, h, w, c = x.shape
    k_apply, k_lmda, k_perm = jax.random.split(rng, 3)

    # [B, C, HW]: sort each channel's spatial values
    x_view = x.reshape(b, h * w, c).transpose(0, 2, 1)
    order = jnp.argsort(x_view, axis=-1)
    value_x = jnp.take_along_axis(x_view, order, axis=-1)
    inverse = jnp.argsort(order, axis=-1)

    lmda = jax.random.beta(k_lmda, alpha, alpha, (b, 1, 1)).astype(x.dtype)
    perm = _mix_permutation(k_perm, b, mix)
    x_copy = jnp.take_along_axis(value_x[perm], inverse, axis=-1)
    new_x = x_view + (x_copy - jax.lax.stop_gradient(x_view)) * (1.0 - lmda)
    mixed = new_x.transpose(0, 2, 1).reshape(b, h, w, c)

    apply = jax.random.bernoulli(k_apply, p)
    return jnp.where(apply, mixed, x)


# ---------------------------------------------------------------------------
# distribution distances
# ---------------------------------------------------------------------------

def _offdiag_mean(k):
    """Mean over off-diagonal entries of a square kernel matrix —
    equivalent to the reference's remove_self_distance + .mean() without
    materializing the [n, n-1] matrix row by row."""
    n = k.shape[0]
    return (k.sum() - jnp.trace(k)) / (n * (n - 1))


def _sq_euclidean(x, y):
    return (
        (x ** 2).sum(axis=1, keepdims=True)
        + (y ** 2).sum(axis=1)[None, :]
        - 2.0 * x @ y.T
    )


def _rbf_mixture(d, sigmas=(1.0, 5.0, 10.0)):
    k = 0.0
    for sigma in sigmas:
        gamma = 1.0 / (2.0 * sigma ** 2)
        k = k + jnp.exp(-gamma * d)
    return k


def mmd(x, y, kernel_type: str = "rbf", normalize: bool = False):
    """Maximum mean discrepancy between two ``[B, D]`` batches
    (reference ops/mmd.py; self-distances excluded from k_xx/k_yy)."""
    if normalize:
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        y = y / jnp.linalg.norm(y, axis=1, keepdims=True)
    if kernel_type == "linear":
        return (
            _offdiag_mean(x @ x.T) + _offdiag_mean(y @ y.T) - 2 * (x @ y.T).mean()
        )
    if kernel_type == "poly":
        alpha, c, d = 1.0, 2.0, 2
        return (
            _offdiag_mean((alpha * (x @ x.T) + c) ** d)
            + _offdiag_mean((alpha * (y @ y.T) + c) ** d)
            - 2 * ((alpha * (x @ y.T) + c) ** d).mean()
        )
    if kernel_type == "rbf":
        return (
            _offdiag_mean(_rbf_mixture(_sq_euclidean(x, x)))
            + _offdiag_mean(_rbf_mixture(_sq_euclidean(y, y)))
            - 2 * _rbf_mixture(_sq_euclidean(x, y)).mean()
        )
    raise NotImplementedError(kernel_type)


def _ot_distance(x, y, dist_metric: str):
    if dist_metric == "cosine":
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        y = y / jnp.linalg.norm(y, axis=1, keepdims=True)
        return 1.0 - x @ y.T
    if dist_metric in ("euclidean", "fast_euclidean"):
        return _sq_euclidean(x, y)
    raise ValueError(f"Unknown cost function: {dist_metric}")


def _sinkhorn_plan(c, eps: float, max_iter: int, thre: float = 1e-3):
    """Log-domain Sinkhorn iterations under ``lax.while_loop`` (early stop
    on the |u - u0| residual, like the reference's real_iter loop)."""
    nx, ny = c.shape
    log_mu = jnp.log(jnp.full((nx,), 1.0 / nx) + 1e-8)
    log_nu = jnp.log(jnp.full((ny,), 1.0 / ny) + 1e-8)

    def m(u, v):
        return (-c + u[:, None] + v[None, :]) / eps

    def cond(carry):
        _, _, err, i = carry
        return jnp.logical_and(i < max_iter, err >= thre)

    def body(carry):
        u, v, _, i = carry
        u_new = eps * (log_mu - jax.nn.logsumexp(m(u, v), axis=1)) + u
        v_new = eps * (log_nu - jax.nn.logsumexp(m(u_new, v).T, axis=1)) + v
        err = jnp.abs(u_new - u).sum()
        return u_new, v_new, err, i + 1

    u0 = jnp.zeros((nx,), c.dtype)
    v0 = jnp.zeros((ny,), c.dtype)
    u, v, _, _ = jax.lax.while_loop(cond, body, (u0, v0, jnp.inf, 0))
    return jnp.exp(m(u, v))


def _transport_cost(
    x, y, dist_metric: str, eps: float, max_iter: int, bp_to_sinkhorn: bool
):
    c = _ot_distance(x, y, dist_metric)
    pi = _sinkhorn_plan(c, eps, max_iter)
    if not bp_to_sinkhorn:
        pi = jax.lax.stop_gradient(pi)
    return (pi * c).sum()


def sinkhorn_divergence(
    x,
    y,
    dist_metric: str = "cosine",
    eps: float = 0.01,
    max_iter: int = 5,
    bp_to_sinkhorn: bool = False,
):
    """Sinkhorn divergence ``2 W(x,y) - W(x,x) - W(y,y)`` between two
    ``[B, D]`` batches (reference ops/optimal_transport.py)."""
    cost = partial(
        _transport_cost,
        dist_metric=dist_metric,
        eps=eps,
        max_iter=max_iter,
        bp_to_sinkhorn=bp_to_sinkhorn,
    )
    return 2.0 * cost(x, y) - cost(x, x) - cost(y, y)


def minibatch_energy_distance(
    x,
    y,
    dist_metric: str = "cosine",
    eps: float = 0.01,
    max_iter: int = 5,
    bp_to_sinkhorn: bool = False,
):
    """Minibatch energy distance over split halves (reference
    ops/optimal_transport.py::MinibatchEnergyDistance)."""
    cost = partial(
        _transport_cost,
        dist_metric=dist_metric,
        eps=eps,
        max_iter=max_iter,
        bp_to_sinkhorn=bp_to_sinkhorn,
    )
    x1, x2 = jnp.split(x, 2, axis=0)
    y1, y2 = jnp.split(y, 2, axis=0)
    return (
        cost(x1, y1)
        + cost(x1, y2)
        + cost(x2, y1)
        + cost(x2, y2)
        - 2.0 * cost(x1, x2)
        - 2.0 * cost(y1, y2)
    )
