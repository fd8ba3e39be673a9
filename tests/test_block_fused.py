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

pytestmark = pytest.mark.quick


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


# ---------------------------------------------------------------------------
# Pallas dx backward kernels (ops/block_fused_bwd.py)
# ---------------------------------------------------------------------------


def test_mlp_bwd_dx_kernel_matches_xla(setup):
    from ovmr_tpu.ops.block_fused_bwd import mlp_half_bwd_dx

    x, p, _ = setup
    g = jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)

    def half(y):
        return y + mlp_block(layer_norm(y, p["ln_2_scale"], p["ln_2_bias"]), p)

    _, vjp = jax.vjp(half, x)
    (ref,) = vjp(g)
    got = mlp_half_bwd_dx(
        x, g, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"],
        p["ln_2_scale"], p["ln_2_bias"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_attn_bwd_dx_kernel_matches_xla(setup, masked):
    from ovmr_tpu.ops.block_fused_bwd import attn_half_bwd_dx

    x, p, n_head = setup
    mask = causal_mask(x.shape[1]) if masked else None
    g = jax.random.normal(jax.random.PRNGKey(4), x.shape, x.dtype)

    def half(x_):
        return x_ + multi_head_attention(
            layer_norm(x_, p["ln_1_scale"], p["ln_1_bias"]), p, n_head, mask
        )

    _, vjp = jax.vjp(half, x)
    (ref,) = vjp(g)
    got = attn_half_bwd_dx(
        x, g, p["w_qkv"], p["b_qkv"], p["w_out"],
        p["ln_1_scale"], p["ln_1_bias"], mask=mask, n_head=n_head,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_block_masked_gradients_match(setup):
    """The text-tower training shape: causal mask, grads flow through to
    the prompt embeddings (dx) — the stage-1/stage-2 backward path."""
    x, p, n_head = setup
    mask = causal_mask(x.shape[1])

    def loss_fused(x_):
        return jnp.sum(
            fused_residual_block(x_, p, n_head, mask=mask, interpret=True)
            ** 2
        )

    def loss_ref(x_):
        return jnp.sum(residual_attention_block(x_, p, n_head, mask) ** 2)

    gx_f = jax.grad(loss_fused)(x)
    gx_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)


def test_fused_block_bwd_odd_batch(setup):
    """dx kernels on a batch that doesn't divide the tile limit."""
    _, p, n_head = setup
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 17, 64), jnp.float32)

    def loss_fused(x_):
        return jnp.sum(fused_residual_block(x_, p, n_head, interpret=True) ** 2)

    def loss_ref(x_):
        return jnp.sum(residual_attention_block(x_, p, n_head) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        atol=1e-4,
    )


def test_fused_block_bf16_gradients_close(setup):
    """bf16 activations (the shipped training dtype): dx from the Pallas
    kernels tracks the XLA-path gradient within bf16 rounding."""
    x, p, n_head = setup
    x16 = x.astype(jnp.bfloat16)
    p16 = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    mask = causal_mask(x.shape[1])

    def loss_fused(x_):
        y = fused_residual_block(x_, p16, n_head, mask=mask, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x_):
        y = residual_attention_block(x_, p16, n_head, mask)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = np.asarray(jax.grad(loss_fused)(x16), np.float32)
    gr = np.asarray(jax.grad(loss_ref)(x16), np.float32)
    denom = max(np.abs(gr).max(), 1e-6)
    assert np.abs(gf - gr).max() / denom < 0.03
    cos = (gf * gr).sum() / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-30)
    assert cos > 0.999


def test_tile_caps_padded_x_bytes():
    """Tile selection stays within the measured scoped-VMEM envelope:
    padded x-tile bytes <= the largest proven-good point (text g=16 =
    1.311 MB); ViT-B/32's g=16 (1.376 MB) overflowed on chip."""
    from ovmr_tpu.ops.block_fused import (
        _TILE_X_BYTES,
        _bwd_g_limits,
        _g_limits,
    )

    for l, d, hidden in [(50, 768, 3072), (197, 768, 3072), (77, 512, 2048),
                         (257, 1024, 4096), (577, 1024, 4096)]:
        l_pad = -8 * (-l // 8)
        for fn in (_g_limits, _bwd_g_limits):
            g_attn, g_mlp = fn(l, d, hidden, 2)
            assert g_attn * l_pad * d * 2 <= _TILE_X_BYTES, (fn.__name__, l)
            assert g_mlp * l_pad * d * 2 <= _TILE_X_BYTES, (fn.__name__, l)
    # measured winners are preserved: ViT-B/16 (4, 2); the text tower's
    # shipped g=16 attention tile (classifier-gen recipe); B/32 capped
    # below the overflowing g=16
    assert _g_limits(197, 768, 3072, 2) == (4, 2)
    assert _g_limits(77, 512, 2048, 2)[0] == 16
    assert _g_limits(50, 768, 3072, 2)[0] < 16


@pytest.mark.parametrize(
    "l,want_attn_g,want_mlp",
    [
        (257, 2, ("resident", 2)),  # ViT-L/14@224: measured winner
        (577, 1, ("chunked", 1)),   # @336: chunked stays faster
    ],
)
def test_vitl_routing(monkeypatch, l, want_attn_g, want_mlp):
    """Static routing for big-weight towers (tools/ab_vitl2.py /
    ab_vitl336.py measurements): ViT-L@224 runs fused attention g=2 +
    fully-RESIDENT 16.8 MB MLP g=2; @336's 577-token padded x-tile caps g
    at 1, where chunked streaming measured faster. Kernels are stubbed —
    this pins the trace-time selector only."""
    import ovmr_tpu.ops.block_fused as bf

    calls = []
    monkeypatch.setattr(
        bf, "fused_attn_half",
        lambda x, *a, **k: (calls.append(("attn", k["g_limit"])), x)[1],
    )
    monkeypatch.setattr(
        bf, "fused_mlp_half",
        lambda y, *a, **k: (calls.append(("resident", k["g_limit"])), y)[1],
    )
    monkeypatch.setattr(
        bf, "fused_mlp_half_chunked",
        lambda y, *a, **k: (calls.append(("chunked", k["g_limit"])), y)[1],
    )

    d, hidden = 1024, 4096
    z = jnp.zeros
    p = {
        "w_qkv": z((d, 3 * d), jnp.bfloat16),
        "b_qkv": z((3 * d,), jnp.bfloat16),
        "w_out": z((d, d), jnp.bfloat16),
        "b_out": z((d,), jnp.bfloat16),
        "c_fc_w": z((d, hidden), jnp.bfloat16),
        "c_fc_b": z((hidden,), jnp.bfloat16),
        "c_proj_w": z((hidden, d), jnp.bfloat16),
        "c_proj_b": z((d,), jnp.bfloat16),
        "ln_1_scale": z((d,), jnp.bfloat16),
        "ln_1_bias": z((d,), jnp.bfloat16),
        "ln_2_scale": z((d,), jnp.bfloat16),
        "ln_2_bias": z((d,), jnp.bfloat16),
    }
    x = z((2, l, d), jnp.bfloat16)
    bf._fused_block_fwd_impl(x, p, 16, None)
    assert ("attn", want_attn_g) in calls, calls
    assert want_mlp in calls, calls


@pytest.mark.parametrize(
    "b,l,d,n_head,dtype,masked",
    [
        (1, 1, 64, 1, jnp.float32, False),
        (2, 2, 64, 2, jnp.float32, True),
        (5, 9, 64, 2, jnp.float32, False),
        (3, 33, 128, 4, jnp.bfloat16, True),
        (7, 18, 128, 2, jnp.bfloat16, False),
        (4, 77, 64, 2, jnp.float32, True),
    ],
)
def test_fused_block_random_shapes(b, l, d, n_head, dtype, masked):
    """Property sweep: odd batch/sequence/width combos agree with the XLA
    block in interpret mode (tile selection must handle any divisor
    pattern, mask slicing any L)."""
    key = jax.random.PRNGKey(b * 1000 + l)
    p = {
        k: (jax.random.normal(jax.random.fold_in(key, i), s) * 0.05).astype(
            dtype
        )
        if "scale" not in k and "bias" not in k
        else (jnp.ones(s, dtype) if "scale" in k else jnp.zeros(s, dtype))
        for i, (k, s) in enumerate(
            [
                ("w_qkv", (d, 3 * d)), ("b_qkv", (3 * d,)),
                ("w_out", (d, d)), ("b_out", (d,)),
                ("ln_1_scale", (d,)), ("ln_1_bias", (d,)),
                ("c_fc_w", (d, 4 * d)), ("c_fc_b", (4 * d,)),
                ("c_proj_w", (4 * d, d)), ("c_proj_b", (d,)),
                ("ln_2_scale", (d,)), ("ln_2_bias", (d,)),
            ]
        )
    }
    x = jax.random.normal(jax.random.fold_in(key, 99), (b, l, d), dtype)
    mask = causal_mask(l) if masked else None
    ref = residual_attention_block(x, p, n_head, mask)
    got = fused_residual_block(x, p, n_head, mask, interpret=True)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol,
    )


@pytest.mark.parametrize(
    "b,l,d,n_head,masked",
    [
        (1, 1, 64, 1, False),
        (3, 9, 64, 2, True),
        (5, 33, 128, 4, False),
        (2, 77, 64, 2, True),
    ],
)
def test_fused_block_bwd_random_shapes(b, l, d, n_head, masked):
    """dx property sweep: the Pallas backward kernels agree with XLA
    autodiff at odd shapes (interpret mode)."""
    key = jax.random.PRNGKey(b * 77 + l)
    p = {
        k: (jax.random.normal(jax.random.fold_in(key, i), s) * 0.05).astype(
            jnp.float32
        )
        if "scale" not in k and "bias" not in k
        else (jnp.ones(s) if "scale" in k else jnp.zeros(s))
        for i, (k, s) in enumerate(
            [
                ("w_qkv", (d, 3 * d)), ("b_qkv", (3 * d,)),
                ("w_out", (d, d)), ("b_out", (d,)),
                ("ln_1_scale", (d,)), ("ln_1_bias", (d,)),
                ("c_fc_w", (d, 4 * d)), ("c_fc_b", (4 * d,)),
                ("c_proj_w", (4 * d, d)), ("c_proj_b", (d,)),
                ("ln_2_scale", (d,)), ("ln_2_bias", (d,)),
            ]
        )
    }
    x = jax.random.normal(jax.random.fold_in(key, 99), (b, l, d), jnp.float32)
    mask = causal_mask(l) if masked else None

    def loss_fused(x_):
        return jnp.sum(
            fused_residual_block(x_, p, n_head, mask=mask, interpret=True)
            ** 2
        )

    def loss_ref(x_):
        return jnp.sum(residual_attention_block(x_, p, n_head, mask) ** 2)

    gx_f = jax.grad(loss_fused)(x)
    gx_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=1e-4, rtol=1e-4
    )
