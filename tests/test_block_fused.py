"""Fused residual-block Pallas kernels vs the XLA-math path (interpret
mode on CPU; the TPU A/B perf comparison lives in docs/DESIGN.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.block_fused import (
    fused_attn_half,
    fused_mlp_half,
    fused_residual_block,
)
from ovmr_tpu.ops.layers import (
    causal_mask,
    layer_norm,
    mlp_block,
    multi_head_attention,
    residual_attention_block,
)


def _layer(key, d, n_layers=1):
    params = jclip.init_params(key, jclip.TINY)
    blocks = params["visual"]["blocks"]
    return {k: v[0] for k, v in blocks.items()}


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    d, n_head, b, l = 64, 2, 4, 17
    p = _layer(key, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d), jnp.float32)
    return x, p, n_head


def test_fused_attn_half_matches_xla(setup):
    x, p, n_head = setup
    ref = x + multi_head_attention(
        layer_norm(x, p["ln_1_scale"], p["ln_1_bias"]), p, n_head
    )
    got = fused_attn_half(
        x, p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"],
        p["ln_1_scale"], p["ln_1_bias"],
        n_head=n_head, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_attn_half_masked_matches_xla(setup):
    x, p, n_head = setup
    mask = causal_mask(x.shape[1])
    ref = x + multi_head_attention(
        layer_norm(x, p["ln_1_scale"], p["ln_1_bias"]), p, n_head, mask
    )
    got = fused_attn_half(
        x, p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"],
        p["ln_1_scale"], p["ln_1_bias"],
        mask=mask, n_head=n_head, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_mlp_half_matches_xla(setup):
    x, p, _ = setup
    ref = x + mlp_block(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p)
    got = fused_mlp_half(
        x, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
        p["ln_2_scale"], p["ln_2_bias"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_block_matches_xla(setup):
    x, p, n_head = setup
    ref = residual_attention_block(x, p, n_head)
    got = fused_residual_block(x, p, n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_block_odd_batch_tiles(setup):
    """Batch sizes that don't divide the tile limit still work (the tile
    picker falls back to a divisor)."""
    _, p, n_head = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 17, 64), jnp.float32)
    ref = residual_attention_block(x, p, n_head)
    got = fused_residual_block(x, p, n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_block_gradients_match(setup):
    """custom VJP: gradients through the fused block equal the XLA path
    (the training step differentiates through the frozen text tower)."""
    x, p, n_head = setup

    def loss_fused(x_, p_):
        return jnp.sum(fused_residual_block(x_, p_, n_head, interpret=True) ** 2)

    def loss_ref(x_, p_):
        return jnp.sum(residual_attention_block(x_, p_, n_head) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
    for k in gp_f:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_r[k]), atol=1e-4, err_msg=k
        )


def test_fused_mlp_half_chunked_matches_xla(setup):
    from ovmr_tpu.ops.block_fused import fused_mlp_half_chunked

    x, p, _ = setup
    ref = x + mlp_block(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p)
    for chunks in (2, 4):
        got = fused_mlp_half_chunked(
            x, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
            p["ln_2_scale"], p["ln_2_bias"], chunks=chunks, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5,
            err_msg=f"chunks={chunks}",
        )


def test_fused_block_fp16_falls_back(setup):
    """TPU.DTYPE=float16 (reference numerics) must not enter the Pallas
    path — it routes to the XLA block and still matches."""
    x, p, n_head = setup
    x16 = x.astype(jnp.float16)
    p16 = {k: v.astype(jnp.float16) for k, v in p.items()}
    ref = residual_attention_block(x16, p16, n_head)
    got = fused_residual_block(x16, p16, n_head, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )
