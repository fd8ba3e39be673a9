"""The Pallas attention wrappers must be differentiable (custom VJP) and the
gradients must match the XLA path."""

import numpy as np

import jax
import jax.numpy as jnp

from ovmr_tpu.ops.layers import attention_xla, causal_mask


def _grads(fn, q, k, v):
    def loss(q_, k_, v_):
        return jnp.sum(fn(q_, k_, v_) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def test_pallas_attention_grad_matches_xla():
    # interpret-mode pallas forward so the test runs on CPU
    import functools

    from ovmr_tpu.ops import attention as A

    orig = A.fused_attention
    A.fused_attention = functools.partial(orig, interpret=True)
    try:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (1, 2, 16, 32), jnp.float32)
        k = jax.random.normal(kk, (1, 2, 16, 32), jnp.float32)
        v = jax.random.normal(kv, (1, 2, 16, 32), jnp.float32)

        ref = _grads(lambda a, b, c: attention_xla(a, b, c, None), q, k, v)
        got = _grads(lambda a, b, c: A.pallas_attention(a, b, c), q, k, v)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

        mask = causal_mask(16)
        ref_m = _grads(lambda a, b, c: attention_xla(a, b, c, mask), q, k, v)
        got_m = _grads(
            lambda a, b, c: A.pallas_attention_masked(a, b, c, mask), q, k, v
        )
        for r, g in zip(ref_m, got_m):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)
    finally:
        A.fused_attention = orig
