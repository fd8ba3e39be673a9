"""Pallas fused attention (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.ops.attention import fused_attention
from ovmr_tpu.ops.layers import attention_xla, causal_mask


@pytest.mark.parametrize("l,d,h", [(16, 32, 2), (77, 64, 1)])
def test_fused_matches_xla_unmasked(l, d, h):
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (2, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (2, h, l, d), jnp.float32)
    ref = attention_xla(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_matches_xla_causal():
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    l, d = 24, 32
    q = jax.random.normal(kq, (1, 2, l, d), jnp.float32)
    k = jax.random.normal(kk, (1, 2, l, d), jnp.float32)
    v = jax.random.normal(kv, (1, 2, l, d), jnp.float32)
    mask = causal_mask(l)
    ref = attention_xla(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_bf16():
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    l, d = 16, 32
    q = jax.random.normal(kq, (1, 1, l, d), jnp.float32)
    k = jax.random.normal(kk, (1, 1, l, d), jnp.float32)
    v = jax.random.normal(kv, (1, 1, l, d), jnp.float32)
    ref = attention_xla(q, k, v)
    out = fused_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )
