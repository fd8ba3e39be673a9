"""Functional modeling ops (reference ``dassl/modeling/ops/``) parity.

Numeric references are straight numpy ports of the torch formulas in
``Dassl.pytorch/dassl/modeling/ops/{mmd,optimal_transport,cross_entropy}.py``
so the JAX implementations are pinned to the reference math, not to
themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmr_tpu.modeling import ops as F


def test_reverse_grad_flips_and_scales():
    g = jax.grad(lambda x: F.reverse_grad(x, 0.5).sum())(jnp.ones((3, 2)))
    np.testing.assert_allclose(np.asarray(g), -0.5 * np.ones((3, 2)))
    # forward is the identity
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(F.reverse_grad(x, 2.0)), np.asarray(x))
    with pytest.raises(ValueError):
        F.reverse_grad(x, -1.0)


def _np_cross_entropy(logits, label, smooth):
    logits = np.asarray(logits, np.float64)
    lp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    n, c = logits.shape
    tgt = np.zeros((n, c))
    tgt[np.arange(n), label] = 1.0
    tgt = (1 - smooth) * tgt + smooth / c
    return (-tgt * lp).sum(1)


def test_cross_entropy_matches_reference_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 7)).astype(np.float32)
    label = rng.integers(0, 7, size=5)
    for smooth in (0.0, 0.1):
        want = _np_cross_entropy(logits, label, smooth)
        got = F.cross_entropy(jnp.asarray(logits), jnp.asarray(label), smooth, "none")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
        got_mean = F.cross_entropy(jnp.asarray(logits), jnp.asarray(label), smooth)
        np.testing.assert_allclose(float(got_mean), want.mean(), rtol=1e-5)


def test_label_utils():
    oh = F.create_onehot(jnp.array([1, 0]), 3)
    np.testing.assert_array_equal(np.asarray(oh), [[0, 1, 0], [1, 0, 0]])
    p = jnp.array([[0.2, 0.8], [0.5, 0.5]])
    sp = F.sharpen_prob(p, 2.0)
    np.testing.assert_allclose(np.asarray(sp.sum(1)), [1.0, 1.0], rtol=1e-6)
    assert float(sp[0, 1]) > 0.8  # sharper
    assert F.sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert F.sigmoid_rampup(10, 10) == 1.0
    assert F.linear_rampup(5, 10) == 0.5
    ema = F.ema_update({"w": jnp.ones(2)}, {"w": jnp.zeros(2)}, 0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.9)


def test_mixup_convex_and_order_preserving():
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((4, 8, 8, 3))
    x2 = jnp.ones((4, 8, 8, 3))
    y1 = F.create_onehot(jnp.array([0, 0, 0, 0]), 2)
    y2 = F.create_onehot(jnp.array([1, 1, 1, 1]), 2)
    xm, ym = F.mixup(x1, x2, y1, y2, 1.0, rng, preserve_order=True)
    # preserve_order: lmda >= 0.5, so xm <= 0.5 everywhere (x1=0 dominant)
    assert float(xm.max()) <= 0.5 + 1e-6
    np.testing.assert_allclose(np.asarray(ym.sum(1)), 1.0, rtol=1e-6)
    # label mix uses the same lambda as the input mix
    np.testing.assert_allclose(np.asarray(xm[:, 0, 0, 0]), np.asarray(ym[:, 1]), rtol=1e-5)


def _np_mmd_linear(x, y):
    def offdiag_mean(k):
        n = k.shape[0]
        return (k.sum() - np.trace(k)) / (n * (n - 1))
    return offdiag_mean(x @ x.T) + offdiag_mean(y @ y.T) - 2 * (x @ y.T).mean()


def _np_mmd_rbf(x, y):
    def sq(a, b):
        return (a**2).sum(1)[:, None] + (b**2).sum(1)[None, :] - 2 * a @ b.T
    def mix(d):
        return sum(np.exp(-d / (2 * s**2)) for s in (1.0, 5.0, 10.0))
    def offdiag_mean(k):
        n = k.shape[0]
        return (k.sum() - np.trace(k)) / (n * (n - 1))
    return (offdiag_mean(mix(sq(x, x))) + offdiag_mean(mix(sq(y, y)))
            - 2 * mix(sq(x, y)).mean())


def test_mmd_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    y = rng.normal(size=(5, 16)).astype(np.float32) + 0.5
    got = F.mmd(jnp.asarray(x), jnp.asarray(y), "linear")
    np.testing.assert_allclose(float(got), _np_mmd_linear(x, y), rtol=1e-4)
    got = F.mmd(jnp.asarray(x), jnp.asarray(y), "rbf")
    np.testing.assert_allclose(float(got), _np_mmd_rbf(x, y), rtol=1e-4)
    # shifted distributions are further apart than identical ones
    far = F.mmd(jnp.asarray(x), jnp.asarray(y + 10.0), "rbf")
    assert float(far) > float(got)


def _np_sinkhorn_cost(x, y, eps=0.01, max_iter=5, thre=1e-3):
    """Direct port of the reference's log-domain loop."""
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=1, keepdims=True)
    C = 1.0 - xn @ yn.T
    nx, ny = C.shape
    mu = np.full(nx, 1.0 / nx)
    nu = np.full(ny, 1.0 / ny)
    u = np.zeros(nx)
    v = np.zeros(ny)

    def M(u, v):
        return (-C + u[:, None] + v[None, :]) / eps

    def lse(m):
        mx = m.max(axis=1, keepdims=True)
        return (mx + np.log(np.exp(m - mx).sum(1, keepdims=True))).squeeze(1)

    for _ in range(max_iter):
        u0 = u.copy()
        u = eps * (np.log(mu + 1e-8) - lse(M(u, v))) + u
        v = eps * (np.log(nu + 1e-8) - lse(M(u, v).T)) + v
        if np.abs(u - u0).sum() < thre:
            break
    pi = np.exp(M(u, v))
    return (pi * C).sum()


def test_sinkhorn_matches_reference_loop():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 8)).astype(np.float32)
    y = rng.normal(size=(6, 8)).astype(np.float32)
    want = 2 * _np_sinkhorn_cost(x, y) - _np_sinkhorn_cost(x, x) - _np_sinkhorn_cost(y, y)
    got = F.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-5)
    # divergence of a batch with itself is exactly zero by construction
    same = F.sinkhorn_divergence(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(float(same), 0.0, atol=1e-6)
    med = F.minibatch_energy_distance(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(med))


def test_mixstyle_identity_paths_and_determinism():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 3))
    np.testing.assert_array_equal(
        np.asarray(F.mixstyle(x, rng, train=False)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(F.mixstyle(x, rng, p=0.0)), np.asarray(x))
    a = F.mixstyle(x, rng, p=1.0)
    b = F.mixstyle(x, rng, p=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
    c = F.mixstyle(x, jax.random.PRNGKey(7), p=1.0)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # mixed output keeps each sample's normalized shape: channel stats are a
    # convex combination, so values stay finite and batch mean is preserved
    assert np.isfinite(np.asarray(a)).all()


def test_efdmix_matches_sorted_interpolation():
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 3, 3, 2))
    np.testing.assert_array_equal(
        np.asarray(F.efdmix(x, rng, train=False)), np.asarray(x))
    out = F.efdmix(x, rng, p=1.0)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # gradients flow through the sort/gather
    g = jax.grad(lambda v: F.efdmix(v, rng, p=1.0).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_crossdomain_permutation_swaps_halves():
    perm = np.asarray(F._mix_permutation(jax.random.PRNGKey(0), 8, "crossdomain"))
    # first half of the permutation indexes the second half of the batch
    assert set(perm[:4]) == {4, 5, 6, 7}
    assert set(perm[4:]) == {0, 1, 2, 3}


def test_transnorm_and_dsbn_layers():
    import flax.linen  # noqa: F401
    from ovmr_tpu.modeling.layers import DSBN, TransNorm

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 6))
    tn = TransNorm(6)
    vs = tn.init({"params": key}, x, train=True)
    out, upd = tn.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    # source/target running stats diverge when the halves differ
    x2 = x.at[4:].add(3.0)
    _, upd = tn.apply(vs, x2, train=True, mutable=["batch_stats"])
    bs = upd["batch_stats"]
    assert not np.allclose(bs["running_mean_s"], bs["running_mean_t"])
    out_eval = tn.apply(vs, x, train=False)
    assert out_eval.shape == x.shape

    dsbn = DSBN(6, n_domain=2)
    # ONE init materializes every domain's BN (reference builds all
    # n_domain BNs up front so select_bn can switch domains)
    vs = dsbn.init({"params": key}, x, domain_idx=0, train=True)
    assert "bn_0" in vs["params"] and "bn_1" in vs["params"]
    assert "bn_0" in vs["batch_stats"] and "bn_1" in vs["batch_stats"]
    out, upd = dsbn.apply(vs, x, domain_idx=0, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    # the same variables serve any other domain, and a train forward
    # updates ONLY the selected domain's running stats
    out1, upd1 = dsbn.apply(
        vs, x + 1.0, domain_idx=1, train=True, mutable=["batch_stats"]
    )
    assert out1.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(upd1["batch_stats"]["bn_0"]["mean"]),
        np.asarray(vs["batch_stats"]["bn_0"]["mean"]),
    )
    assert not np.allclose(
        np.asarray(upd1["batch_stats"]["bn_1"]["mean"]),
        np.asarray(vs["batch_stats"]["bn_1"]["mean"]),
    )


def test_attention_and_dynamic_conv():
    from ovmr_tpu.modeling.layers import Attention, Conv2dDynamic

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 32))
    att = Attention(32, 4)
    vs = att.init(key, x)
    w = att.apply(vs, x)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    conv = Conv2dDynamic(32, 16, 3, stride=2)
    vs = conv.init(key, x)
    out = conv.apply(vs, x)
    assert out.shape == (2, 4, 4, 16)
