"""Visual token generator ("aggregator") — the ONLY trained module.

A 4-layer pre-LN transformer with dropout that compresses a class's exemplar
image features into ``n_ctx`` visual tokens (vokens). Re-designed from the
reference ``TransformerDropout`` (``clip/model.py:341-358``, blocks
``:219-252``) and its instantiation/init in
``trainers/mm_classifier_one_prompt.py:138-154``:

- width = CLIP embed dim (512 for ViT-B), heads = width//64, layers = 4;
- dropout 0.1 on attention probabilities and twice inside the MLP
  (after QuickGELU and after c_proj);
- weights scaled-normal-initialized exactly like CLIP's text transformer;
  biases init to zero (torch defaults a uniform Linear-bias init; the
  difference only affects from-scratch training and is noted here);
- the learned query ``cls_token`` [n_ctx, width] is unit-normalized noise.

Batch-major: input [N_class, n_ctx + n_exemplar, width]; the first n_ctx
output positions are the vokens.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ovmr_tpu.ops.layers import (
    attention_xla,
    dense,
    l2_normalize,
    layer_norm,
    merge_heads,
    quick_gelu,
    split_heads,
)


def init_aggregator(
    key: jax.Array,
    width: int = 512,
    layers: int = 4,
    n_ctx: int = 2,
    dtype=jnp.float32,
) -> dict:
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(key, 5)
    normal = jax.random.normal
    blocks = {
        "w_qkv": (normal(ks[0], (layers, width, 3 * width)) * attn_std).astype(dtype),
        "b_qkv": jnp.zeros((layers, 3 * width), dtype),
        "w_out": (normal(ks[1], (layers, width, width)) * proj_std).astype(dtype),
        "b_out": jnp.zeros((layers, width), dtype),
        "ln_1_scale": jnp.ones((layers, width), dtype),
        "ln_1_bias": jnp.zeros((layers, width), dtype),
        "c_fc_w": (normal(ks[2], (layers, width, 4 * width)) * fc_std).astype(dtype),
        "c_fc_b": jnp.zeros((layers, 4 * width), dtype),
        "c_proj_w": (normal(ks[3], (layers, 4 * width, width)) * proj_std).astype(dtype),
        "c_proj_b": jnp.zeros((layers, width), dtype),
        "ln_2_scale": jnp.ones((layers, width), dtype),
        "ln_2_bias": jnp.zeros((layers, width), dtype),
    }
    cls_token = l2_normalize(normal(ks[4], (n_ctx, width))).astype(dtype)
    return {"blocks": blocks, "cls_token": cls_token}


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _dropout_block(
    x: jax.Array,
    p: dict,
    n_head: int,
    dropout: float,
    rng: Optional[jax.Array],
    attn_fn=attention_xla,
) -> jax.Array:
    """Pre-LN residual block with dropout placement matching the reference
    ``ResidualAttentionBlockWithDropout`` (attn-prob dropout; MLP dropout
    after gelu and after c_proj)."""
    r_attn, r_fc, r_proj = (
        jax.random.split(rng, 3) if rng is not None else (None, None, None)
    )

    h = layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    qkv = dense(h, p["w_qkv"], p["b_qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, n_head) for t in (q, k, v))

    if r_attn is not None and dropout > 0.0:
        # expand the fused path: dropout must hit the attention probabilities
        scale = q.shape[-1] ** -0.5
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(scores, axis=-1)
        probs = _dropout(probs, dropout, r_attn)
        attn_out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    else:
        attn_out = attn_fn(q, k, v, None)

    attn_out = dense(merge_heads(attn_out), p["w_out"], p["b_out"])
    x = x + attn_out

    h = layer_norm(x, p["ln_2_scale"], p["ln_2_bias"])
    h = quick_gelu(dense(h, p["c_fc_w"], p["c_fc_b"]))
    h = _dropout(h, dropout, r_fc)
    h = dense(h, p["c_proj_w"], p["c_proj_b"])
    h = _dropout(h, dropout, r_proj)
    return x + h


def generate_vokens(
    params: dict,
    exemplar_feats: jax.Array,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_fn=attention_xla,
) -> jax.Array:
    """exemplar_feats [N, K, D] -> vokens [N, n_ctx, D].

    Prepends the learned cls_token queries and runs the aggregator; the
    first n_ctx outputs are the visual tokens
    (reference ``trainers/mm_classifier_one_prompt.py:167-169``).
    """
    n, k, d = exemplar_feats.shape
    cls = params["cls_token"].astype(exemplar_feats.dtype)
    n_ctx = cls.shape[0]
    x = jnp.concatenate(
        [jnp.broadcast_to(cls[None], (n, n_ctx, d)), exemplar_feats], axis=1
    )

    blocks = params["blocks"]
    n_layers = blocks["w_qkv"].shape[0]
    n_head = d // 64

    if rng is None or dropout <= 0.0:
        def body(h, layer_params):
            return (
                _dropout_block(h, layer_params, n_head, 0.0, None, attn_fn),
                None,
            )

        x, _ = jax.lax.scan(body, x, blocks)
    else:
        rngs = jax.random.split(rng, n_layers)

        def body(h, inp):
            layer_params, r = inp
            return _dropout_block(h, layer_params, n_head, dropout, r, attn_fn), None

        x, _ = jax.lax.scan(body, x, (blocks, rngs))

    return x[:, :n_ctx, :]
