"""int8 quantized serving path: weight quantization roundtrip, quantized
dense accuracy, and full-tower feature fidelity vs fp32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.layers import l2_normalize
from ovmr_tpu.ops.quant import dense_int8, quantize_params, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # per-channel int8 keeps <1% max error


def test_dense_int8_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    w = rng.randn(64, 32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    q, scale = quantize_weight(w)
    ref = np.asarray(x) @ w + b
    got = np.asarray(dense_int8(x, jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b)))
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_quantized_tower_feature_fidelity():
    cfg = jclip.TINY
    key = jax.random.PRNGKey(0)
    params = jclip.init_params(key, cfg)
    qparams = quantize_params(
        jax.tree_util.tree_map(np.asarray, params)
    )

    images = jax.random.normal(key, (4, 3, 32, 32), jnp.float32)
    ref = l2_normalize(jclip.encode_image(params, cfg, images))
    got = l2_normalize(jclip.encode_image(qparams, cfg, images))
    cos = np.sum(np.asarray(ref) * np.asarray(got), axis=-1)
    assert (cos > 0.995).all(), cos

    tokens = jax.random.randint(key, (4, 77), 1, 400)
    tokens = tokens.at[:, 0].set(510).at[:, 6].set(511)
    ref_t = l2_normalize(jclip.encode_text(params, cfg, tokens))
    got_t = l2_normalize(jclip.encode_text(qparams, cfg, tokens))
    cos_t = np.sum(np.asarray(ref_t) * np.asarray(got_t), axis=-1)
    assert (cos_t > 0.995).all(), cos_t
