"""Core numerics shared by all towers.

Mirrors the reference CLIP numerics contract (``clip/model.py``):

- LayerNorm always computes in float32 and casts back to the input dtype
  (reference ``clip/model.py:153-159`` — the fp16-safe LayerNorm).
- QuickGELU is ``x * sigmoid(1.702 x)`` (reference ``clip/model.py:162-164``).
- Multi-head attention follows torch ``nn.MultiheadAttention`` semantics:
  packed QKV projection, per-head scaling by ``head_dim**-0.5``, additive
  mask, output projection. Softmax runs in float32 (an accuracy upgrade over
  torch-fp16; harmless for parity at the tolerance ladder we test under).

All matmuls request float32 accumulation (``preferred_element_type``) so
bf16/fp16 activations still accumulate at full precision on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """x @ w (+ b) with fp32 accumulation; w stored [in, out]."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _block_dense(x: jax.Array, p: dict, key: str) -> jax.Array:
    """Block matmul dispatching on weight dtype: int8 weights (serving
    quantization, :mod:`ovmr_tpu.ops.quant`) take the dynamic-quant path."""
    w = p[key]
    bias_key = {
        "w_qkv": "b_qkv", "w_out": "b_out",
        "c_fc_w": "c_fc_b", "c_proj_w": "c_proj_b",
    }[key]
    if w.dtype == jnp.int8:
        from ovmr_tpu.ops.quant import dense_int8

        return dense_int8(x, w, p[key + "_scale"], p[bias_key])
    return dense(x, w, p[bias_key])


def mlp_block(x: jax.Array, p: dict) -> jax.Array:
    """c_fc -> QuickGELU -> c_proj (reference ResidualAttentionBlock.mlp)."""
    h = _block_dense(x, p, "c_fc_w")
    h = quick_gelu(h)
    return _block_dense(h, p, "c_proj_w")


def split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """[B, L, D] -> [B, H, L, Dh]"""
    b, l, d = x.shape
    return x.reshape(b, l, n_head, d // n_head).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, Dh] -> [B, L, D]"""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-path attention: [B, H, L, Dh] inputs, additive mask [L, L].

    Scores and softmax in float32; output cast back to q.dtype. XLA fuses
    this well; the Pallas kernel in :mod:`ovmr_tpu.ops.attention` is the
    TPU fast path for the same contract.
    """
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def multi_head_attention(
    x: jax.Array,
    p: dict,
    n_head: int,
    mask: Optional[jax.Array] = None,
    attn_fn=attention_xla,
) -> jax.Array:
    """torch ``nn.MultiheadAttention`` equivalent over batch-major [B, L, D].

    Params: ``w_qkv`` [D, 3D], ``b_qkv`` [3D], ``w_out`` [D, D], ``b_out`` [D]
    (transposed from torch's [3D, D] in_proj so the hot op is x @ W on MXU).
    """
    qkv = _block_dense(x, p, "w_qkv")  # [B, L, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, n_head) for t in (q, k, v))
    out = attn_fn(q, k, v, mask)
    out = merge_heads(out)
    return _block_dense(out, p, "w_out")


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference ``clip/model.py:802-808``)."""
    neg = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(neg, k=1)


def residual_attention_block(
    x: jax.Array,
    p: dict,
    n_head: int,
    mask: Optional[jax.Array] = None,
    attn_fn=attention_xla,
) -> jax.Array:
    """Pre-LN block: x + MHA(LN(x)); x + MLP(LN(x))
    (reference ``clip/model.py:191-194``)."""
    x = x + multi_head_attention(
        layer_norm(x, p["ln_1_scale"], p["ln_1_bias"]), p, n_head, mask, attn_fn
    )
    x = x + mlp_block(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p)
    return x


def residual_block_remat(
    x: jax.Array,
    p: dict,
    n_head: int,
    mask: Optional[jax.Array] = None,
    attn_fn=attention_xla,
) -> jax.Array:
    """XLA block with per-layer rematerialization — identical values, but
    backward recomputes the layer instead of saving its intermediates.

    The text tower is differentiated THROUGH in training (stage-1 classifier
    heads, stage-2 CoOp); without remat XLA saves every per-layer
    intermediate of the 12-block scan, ~29 MB/layer per 77-token sequence —
    86 GB for a 1000-class 3-prompt CoOp batch on a 15.75 GB chip. The
    fused Pallas block's custom VJP remats by construction; this is the
    equivalent for the XLA fallback paths (CPU, fp16 numerics, int8)."""
    return jax.checkpoint(
        lambda x_, p_: residual_attention_block(x_, p_, n_head, mask, attn_fn)
    )(x, p)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """Unit-normalize along `axis` in float32 (matches torch
    ``x / x.norm(dim=-1, keepdim=True)`` up to dtype rounding)."""
    xf = x.astype(jnp.float32)
    norm = jnp.linalg.norm(xf, axis=axis, keepdims=True)
    return (xf / (norm + eps)).astype(x.dtype)
