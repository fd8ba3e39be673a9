"""Exploratory ViT encode variants (reference ``clip/model.py:184-217,
254-259, 311-325, 352-358, 382-409, 430-714``).

The reference ships ~a dozen research forward paths on its
VisionTransformer / block classes that no shipped trainer calls (SURVEY
§2a row 3 "not called"). They are rebuilt here as pure functions over the
same parameter pytree as :mod:`ovmr_tpu.models.clip`, so the capability
surface is complete — with the TPU-first redesigns you'd expect:

- "last block behaves differently" paths split the stacked block leaves
  into a scanned front and an explicit last layer (no per-layer module
  mutation like the reference's ``resblocks[-1].attn_mask = ...``);
- :func:`forward_multi_pos` replaces the reference's 25 sequential
  variable-length programs (boolean-mask token selection => a different
  shape per shift) with ONE batched fixed-shape program: out-of-window
  tokens are masked additively, which is mathematically identical for
  the CLS output (attention is the only cross-token op; LN/MLP are
  per-token) while compiling once;
- several reference bodies crash if ever called (``get_avg_patch_embed``
  unpacks a single tensor, ``forward_with_mmclassfier``'s in-place add,
  the feat-map adapter's mismatched MHA batch dims). The evident intent
  is implemented and the divergence documented per function.

Everything here is diagnostics/research surface, NOT a hot path: plain
XLA math (the fused Pallas kernels are for the shipped towers), fp32
softmax, jit-friendly static shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ovmr_tpu.models.clip import CLIPConfig, patch_embed, run_blocks
from ovmr_tpu.ops.layers import (
    attention_xla,
    dense,
    layer_norm,
    mlp_block,
    multi_head_attention,
    residual_attention_block,
    split_heads,
)


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def prepare_tokens(params: dict, cfg: CLIPConfig, images: jax.Array,
                   layout: str = "NCHW") -> jax.Array:
    """Patchify + cls + positional embedding, NO ln_pre (reference
    ``prepare_tokens``, model.py:382-388). Returns [B, 1+G^2, D]."""
    v = params["visual"]
    dtype = v["patch_embed_w"].dtype
    x = patch_embed(
        images.astype(dtype), v["patch_embed_w"], cfg.vision_patch_size,
        layout,
    )
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + v["positional_embedding"].astype(dtype)


def _split_last(blocks: dict) -> Tuple[dict, dict]:
    """Stacked block leaves [L, ...] -> (front [L-1, ...], last [...])."""
    front = {k: leaf[:-1] for k, leaf in blocks.items()}
    last = {k: leaf[-1] for k, leaf in blocks.items()}
    return front, last


def _pool_project(v: dict, x_cls: jax.Array) -> jax.Array:
    pooled = layer_norm(x_cls, v["ln_post_scale"], v["ln_post_bias"])
    return jnp.dot(
        pooled, v["proj"].astype(x_cls.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x_cls.dtype)


def last_visual_attention_mask(length: int) -> jax.Array:
    """Diagonal-only attention with a fully-open first row (reference
    ``build_last_visual_attention_mask``, model.py:647-655): every token
    attends only to itself, except the CLS token which sees everything."""
    neg = jnp.full((length, length), -jnp.inf, jnp.float32)
    mask = neg.at[jnp.arange(length), jnp.arange(length)].set(0.0)
    return mask.at[0, :].set(0.0)


# --------------------------------------------------------------------------
# whole-tower variants
# --------------------------------------------------------------------------

def forward_with_embeds(params: dict, cfg: CLIPConfig, images: jax.Array,
                        new_embeds: jax.Array,
                        attn_fn=attention_xla) -> jax.Array:
    """Standard encode with EXTRA additive embeddings after the positional
    embedding (reference ``forward_with_embeds`` model.py:468-486 /
    ``CLIP.encode_image_embeds`` :817-818). ``new_embeds`` is [1+G^2, D]."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    x = x + new_embeds.astype(x.dtype)[None]
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :])


def forward_v(params: dict, cfg: CLIPConfig, images: jax.Array,
              vision_prompt: jax.Array, attn_fn=attention_xla) -> jax.Array:
    """Learnable vision-prompt tokens APPENDED after the image tokens
    (reference ``forward_v`` model.py:626-645). ``vision_prompt`` is
    [n_prompt, D]; pooled output is still the CLS token."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    prompt = jnp.broadcast_to(
        vision_prompt.astype(x.dtype)[None],
        (x.shape[0],) + vision_prompt.shape,
    )
    x = jnp.concatenate([x, prompt], axis=1)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :])


def forward_new_cls(params: dict, cfg: CLIPConfig, images: jax.Array,
                    new_cls: jax.Array, attn_fn=attention_xla) -> jax.Array:
    """Standard encode with the class embedding REPLACED by ``new_cls``
    [D] (reference ``forward_new_cls`` model.py:678-696)."""
    v = params["visual"]
    dtype = v["patch_embed_w"].dtype
    x = patch_embed(images.astype(dtype), v["patch_embed_w"],
                    cfg.vision_patch_size)
    cls = jnp.broadcast_to(
        new_cls.astype(dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(dtype)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :])


def forward_eTT(params: dict, cfg: CLIPConfig, images: jax.Array,
                prefix_token=None, attn_fn=attention_xla) -> jax.Array:
    """Reference ``forward_eTT`` (model.py:697-714) accepts a
    ``prefix_token`` argument and then NEVER USES it — the body is the
    plain encode. Quirk preserved: the argument is accepted and ignored."""
    del prefix_token
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :])


def forward_multi_cls(params: dict, cfg: CLIPConfig, images: jax.Array,
                      multi_cls: jax.Array, attn_fn=attention_xla):
    """Multiple learnable class-token groups appended AFTER the image
    tokens with a structured mask (reference ``forward_multi_cls``
    model.py:430-466): image tokens never attend to any appended group,
    each group attends only to itself + the image patches (not the real
    CLS token), and the mask row-blocks between groups. Returns
    ``(x0, x1)`` — the projected real-CLS feature and the projected LAST
    appended token's feature, as the reference does.

    ``multi_cls`` is [model_num, n_token, D]."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    b, base_len, d = x.shape
    model_num, n_token, _ = multi_cls.shape
    extra = model_num * n_token
    tail = jnp.broadcast_to(
        multi_cls.reshape(1, extra, d).astype(x.dtype), (b, extra, d)
    )
    x = jnp.concatenate([x, tail], axis=1)
    total = base_len + extra

    # the reference builds the mask with fill + slice assignments; same
    # result via static index math (host loop over model_num is static)
    mask = jnp.zeros((total, total), jnp.float32)
    mask = mask.at[:, base_len:].set(-jnp.inf)  # nobody sees the groups...
    mask = mask.at[base_len:, 0].set(-jnp.inf)  # ...groups don't see CLS
    for i in range(model_num, 0, -1):
        lo = total - i * n_token
        hi = total - (i - 1) * n_token
        mask = mask.at[lo:hi, lo:hi].set(0.0)  # ...except themselves
    mask = mask.at[total - n_token:, total - n_token:].set(0.0)

    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, mask=mask,
                   attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :]), _pool_project(v, x[:, -1, :])


# --------------------------------------------------------------------------
# exemplar paths (last block masked to diagonal + open CLS row)
# --------------------------------------------------------------------------

def encode_exemplar(params: dict, cfg: CLIPConfig, images: jax.Array,
                    attn_fn=attention_xla):
    """Encode with the LAST block's attention restricted to
    :func:`last_visual_attention_mask` (reference ``encode_exemplar``
    model.py:657-676 — which mutates ``resblocks[-1].attn_mask``; here
    the stacked leaves split into a scanned front + explicit last layer).
    Returns ``(cls_feat [B, E], patch_feats [B, G^2, E])`` — ln_post and
    the projection applied to EVERY token, as the reference does."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    front, last = _split_last(v["blocks"])
    x = run_blocks(x, front, cfg.vision_heads, attn_fn=attn_fn)
    x = residual_attention_block(
        x, last, cfg.vision_heads,
        mask=last_visual_attention_mask(x.shape[1]), attn_fn=attn_fn,
    )
    x = layer_norm(x, v["ln_post_scale"], v["ln_post_bias"])
    x = jnp.dot(
        x, v["proj"].astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x[:, 0, :], x[:, 1:, :]


def encode_exemplar_mmclassifier(params: dict, cfg: CLIPConfig,
                                 images: jax.Array, mm_query: jax.Array,
                                 attn_fn=attention_xla) -> jax.Array:
    """Query-guided exemplar pooling (reference
    ``encode_exemplar_mmclassifier`` model.py:488-515): last block masked
    as in :func:`encode_exemplar`, then the patch tokens are pooled by
    softmax(50 * <query, patch>) and added to the normalized CLS feature.
    ``mm_query`` is [Q, E] with B a multiple of Q (each query covers
    B/Q consecutive images, the reference's repeat-interleave)."""
    cls_feat, patches = encode_exemplar(params, cfg, images, attn_fn)
    b = cls_feat.shape[0]
    q = jnp.repeat(mm_query, b // mm_query.shape[0], axis=0).astype(
        cls_feat.dtype
    )
    x1 = cls_feat / jnp.linalg.norm(cls_feat, axis=-1, keepdims=True)
    x2 = patches / jnp.linalg.norm(patches, axis=-1, keepdims=True)
    w = jax.nn.softmax(
        jnp.einsum("bc,bnc->bn", 50.0 * q, x2).astype(jnp.float32), axis=-1
    ).astype(x2.dtype)
    return x1 + jnp.einsum("bn,bnc->bc", w, x2)


def forward_with_mmclassifier(params: dict, cfg: CLIPConfig,
                              images: jax.Array, mm_query: jax.Array,
                              attn_fn=attention_xla) -> jax.Array:
    """Inject an mm-classifier query INTO the CLS token before the last
    block (reference ``forward_with_mmclassfier`` [sic] model.py:517-537,
    whose in-place ``x[0] += ...`` on the LND tensor adds the query to
    every image's CLS row; batch B must be a multiple of Q)."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    front, last = _split_last(v["blocks"])
    x = run_blocks(x, front, cfg.vision_heads, attn_fn=attn_fn)
    b = x.shape[0]
    q = jnp.repeat(mm_query, b // mm_query.shape[0], axis=0).astype(x.dtype)
    x = x.at[:, 0, :].add(q)
    x = residual_attention_block(x, last, cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :])


# reference spelling kept as an alias so a caller porting reference code
# finds the exact name
forward_with_mmclassfier = forward_with_mmclassifier


# --------------------------------------------------------------------------
# multi-position encoding
# --------------------------------------------------------------------------

def build_multi_pos(params: dict, cfg: CLIPConfig, max_bias: int = 2,
                    stride: int = 1):
    """Shifted positional-embedding variants (reference ``build_multi_pos``
    model.py:539-570): for every (dx, dy) in a (2*max_bias/stride+1)^2
    grid, the spatial pos-embed table shifts by (dx, dy) with
    out-of-window positions zeroed. Returns ``(pos [P, 1+G^2, D],
    keep [P, 1+G^2] bool)`` — CLS always kept."""
    v = params["visual"]
    g = cfg.grid_size
    pe = v["positional_embedding"]
    cls_pos, spatial = pe[:1], pe[1:].reshape(g, g, -1)
    num_pos = 1 + 2 * (max_bias // stride)
    pos_list, keep_list = [], []
    zeros = jnp.zeros_like(spatial)
    for ix in range(num_pos):
        for iy in range(num_pos):
            cx = -max_bias + ix * stride
            cy = -max_bias + iy * stride
            sx, ex = max(0, cx), min(g, cx + g)
            sy, ey = max(0, cy), min(g, cy + g)
            grid = zeros
            keep = jnp.zeros((g, g), bool)
            if ex > sx and ey > sy:
                grid = grid.at[sx:ex, sy:ey].set(spatial[sx:ex, sy:ey])
                keep = keep.at[sx:ex, sy:ey].set(True)
            pos_list.append(
                jnp.concatenate([cls_pos, grid.reshape(g * g, -1)], axis=0)
            )
            keep_list.append(
                jnp.concatenate([jnp.ones((1,), bool), keep.reshape(-1)])
            )
    return jnp.stack(pos_list), jnp.stack(keep_list)


def forward_multi_pos(params: dict, cfg: CLIPConfig, images: jax.Array,
                      max_bias: int = 2, stride: int = 1,
                      attn_fn=attention_xla) -> jax.Array:
    """Encode under every shifted positional embedding (reference
    ``forward_multi_pos`` model.py:572-592). Returns [P, B, E].

    TPU redesign: the reference gathers each shift's kept tokens into a
    DIFFERENT-length sequence and runs P sequential programs. Here all P
    shifts run as one vmapped fixed-shape program with dropped tokens
    masked out additively — for the CLS output this is exact (attention
    is the only cross-token op; a -inf key never contributes, and dropped
    QUERIES can't feed back into kept tokens), and XLA compiles one
    program instead of P."""
    v = params["visual"]
    dtype = v["patch_embed_w"].dtype
    x0 = patch_embed(images.astype(dtype), v["patch_embed_w"],
                     cfg.vision_patch_size)
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype), (x0.shape[0], 1, x0.shape[-1])
    )
    x0 = jnp.concatenate([cls, x0], axis=1)  # NO base positional embedding
    pos, keep = build_multi_pos(params, cfg, max_bias, stride)

    def one(pos_i, keep_i):
        x = x0 + pos_i.astype(dtype)[None]
        x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
        neg = jnp.where(keep_i, 0.0, -jnp.inf).astype(jnp.float32)
        mask = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32) + neg[None]
        x = run_blocks(x, v["blocks"], cfg.vision_heads, mask=mask,
                       attn_fn=attn_fn)
        return _pool_project(v, x[:, 0, :])

    return jax.vmap(one)(pos, keep)


def forward_with_new_pos(params: dict, cfg: CLIPConfig, images: jax.Array,
                         pos_generator: Callable, kv: jax.Array,
                         attn_fn=attention_xla):
    """Predicted positional reassignment (reference ``forward_with_new_pos``
    model.py:594-624): a generator scores every patch against every
    position; each patch ADDS the pos-embed row it argmax-selects on top
    of the standard embedding. ``pos_generator(patch_tokens [B, N, D],
    kv [B, N_kv, D]) -> logits [B, N, N]``. Returns ``(feats [B, E],
    pred_center [B])`` — the argmax patch for the center position."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    n_patches = x.shape[1] - 1
    logits = pos_generator(x[:, 1:, :], kv)
    probs = jax.nn.softmax(logits, axis=-1)
    pred_center = jnp.argmax(probs[:, :, n_patches // 2], axis=-1)
    new_index = jnp.argmax(probs, axis=-1)  # [B, N] rows of the pos table
    new_pos = jnp.take(
        v["positional_embedding"].astype(x.dtype), new_index, axis=0
    )
    x = x.at[:, 1:, :].add(new_pos)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])
    x = run_blocks(x, v["blocks"], cfg.vision_heads, attn_fn=attn_fn)
    return _pool_project(v, x[:, 0, :]), pred_center


# --------------------------------------------------------------------------
# attention introspection
# --------------------------------------------------------------------------

def _attention_probs(xln: jax.Array, p: dict, n_head: int,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-head softmax attention probabilities [B, H, L, L] of one block
    given its ln_1 output."""
    d = xln.shape[-1]
    qkv = dense(xln, p["w_qkv"], p["b_qkv"])
    q, k, _ = jnp.split(qkv, 3, axis=-1)
    q = split_heads(q, n_head)
    k = split_heads(k, n_head)
    scale = (d // n_head) ** -0.5
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    return jax.nn.softmax(scores, axis=-1)


def run_blocks_with_attention(x: jax.Array, blocks: dict, n_head: int,
                              mask: Optional[jax.Array] = None,
                              attn_fn=attention_xla):
    """Scan the stacked blocks, also emitting each layer's attention
    probabilities (reference ``TransformerDropout.forward_with_attention``
    model.py:352-358 / block :254-259). Returns ``(x, attn [Lyr, B, H,
    L, L])``. Diagnostic path: the stacked probs are O(layers*B*H*L^2) —
    keep sequences short."""

    def body(h, p):
        xln = layer_norm(h, p["ln_1_scale"], p["ln_1_bias"])
        probs = _attention_probs(xln, p, n_head, mask)
        h = h + multi_head_attention(xln, p, n_head, mask, attn_fn)
        h = h + mlp_block(layer_norm(h, p["ln_2_scale"], p["ln_2_bias"]), p)
        return h, probs

    return jax.lax.scan(body, x, blocks)


def get_avg_patch_embed(params: dict, cfg: CLIPConfig, images: jax.Array,
                        attn_fn=attention_xla) -> jax.Array:
    """Attention-weighted average of the RAW patch embeddings (reference
    ``get_avg_patch_embed`` model.py:390-409 — whose body crashes if
    called: it unpacks ``x, attn`` from a block that returns one tensor;
    the evident intent is implemented). The last block's per-head
    CLS->patch attention re-normalizes over patches and weights the
    pre-transformer patch tokens; heads average. Returns [B, D]."""
    v = params["visual"]
    x = prepare_tokens(params, cfg, images)
    patch_tokens = x[:, 1:, :]
    # NOTE: the reference does NOT apply ln_pre in prepare_tokens; the
    # blocks there run on the un-pre-normalized tokens. Reproduced.
    front, last = _split_last(v["blocks"])
    x = run_blocks(x, front, cfg.vision_heads, attn_fn=attn_fn)
    xln = layer_norm(x, last["ln_1_scale"], last["ln_1_bias"])
    probs = _attention_probs(xln, last, cfg.vision_heads)  # [B,H,L,L]
    # reference quirk kept: F.softmax applied to the ALREADY-softmaxed
    # CLS->patch probabilities (a second softmax over the values, not a
    # renormalization)
    cls_to_patch = jax.nn.softmax(probs[:, :, 0, 1:], axis=-1)
    weighted = jnp.einsum(
        "bnc,bhn->bhc", patch_tokens.astype(jnp.float32),
        cls_to_patch.astype(jnp.float32),
    )
    return jnp.mean(weighted, axis=1).astype(patch_tokens.dtype)


# --------------------------------------------------------------------------
# block-level adapter variants
# --------------------------------------------------------------------------

def residual_block_with_qk(x: jax.Array, p: dict, n_head: int,
                           q_adapt: jax.Array, k_adapt: jax.Array,
                           mask: jax.Array,
                           attn_fn=attention_xla) -> jax.Array:
    """Adapter-biased residual block (reference ``forward_with_qk`` /
    ``attention_with_qk`` model.py:196-212): adapter q/k projections of
    the ln_1 output form per-head scores whose LOWER TRIANGLE adds to the
    base additive mask; the block then runs standard attention under that
    combined mask. ``q_adapt(xln)``/``k_adapt(xln)`` are [B, L, D] adapter
    outputs (the reference takes arbitrary modules; pass their outputs)."""
    xln = layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    d = x.shape[-1]
    q = split_heads(q_adapt.astype(x.dtype), n_head)
    k = split_heads(k_adapt.astype(x.dtype), n_head)
    scale = (d // n_head) ** -0.5
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    bias = jnp.tril(scores)  # reference: attn_scores.tril()
    combined = mask.astype(jnp.float32)[None, None] + bias
    x = x + multi_head_attention(xln, p, n_head, combined, attn_fn)
    x = x + mlp_block(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p)
    return x


def init_feat_map_adapter(key: jax.Array, width: int,
                          dtype=jnp.float32) -> dict:
    """Params for :func:`block_with_image_feat_map`'s cross-attention
    adapter, matching the reference surface structurally
    (``ResidualAttentionBlockWithDropoutATTN.__init__`` model.py:289-300):
    ``img_proj`` is a width -> 2*width -> width MLP with QuickGELU,
    ``ln_q``/``ln_k``/``ln_v``/``ln_out`` are four separate LayerNorms,
    and ``cross_layer`` is a standard MHA (packed qkv + out proj) — so
    reference-trained adapter state maps leaf-for-leaf."""
    ks = jax.random.split(key, 4)
    std = width ** -0.5
    normal = jax.random.normal
    return {
        "ln_q_scale": jnp.ones((width,), dtype),
        "ln_q_bias": jnp.zeros((width,), dtype),
        "ln_k_scale": jnp.ones((width,), dtype),
        "ln_k_bias": jnp.zeros((width,), dtype),
        "ln_v_scale": jnp.ones((width,), dtype),
        "ln_v_bias": jnp.zeros((width,), dtype),
        "ln_out_scale": jnp.ones((width,), dtype),
        "ln_out_bias": jnp.zeros((width,), dtype),
        # img_proj: c_fc (w -> 2w) + QuickGELU + c_proj (2w -> w)
        "img_proj_fc_w": (
            normal(ks[0], (width, 2 * width)) * (2 * width) ** -0.5
        ).astype(dtype),
        "img_proj_fc_b": jnp.zeros((2 * width,), dtype),
        "img_proj_out_w": (
            normal(ks[1], (2 * width, width)) * std
        ).astype(dtype),
        "img_proj_out_b": jnp.zeros((width,), dtype),
        "w_qkv": (normal(ks[2], (width, 3 * width)) * std).astype(dtype),
        "b_qkv": jnp.zeros((3 * width,), dtype),
        "w_out": (normal(ks[3], (width, width)) * std).astype(dtype),
        "b_out": jnp.zeros((width,), dtype),
    }


def block_with_image_feat_map(x: jax.Array, p: dict, adapter: dict,
                              image_feats: jax.Array, n_head: int,
                              n_ctx: int = 2,
                              mask: Optional[jax.Array] = None,
                              attn_fn=attention_xla) -> jax.Array:
    """Cross-attend context tokens into an image feature map and add the
    pooled result to the remaining tokens (reference
    ``forward_with_image_feat_map`` model.py:311-325 — whose MHA call
    mixes batch sizes B and B*(L-n_ctx) and cannot run; the evident
    intent is implemented with an explicit einsum cross-attention:
    every context token queries the image map, the n_ctx outputs
    average, and the pooled [B, D] adds to every non-context token).

    ``x`` is [B, L, D] (batch-major; the reference is seq-major),
    ``image_feats`` is [B, N_img, D]."""
    from ovmr_tpu.ops.layers import quick_gelu

    x = residual_attention_block(x, p, n_head, mask, attn_fn)
    q = layer_norm(
        x[:, :n_ctx, :], adapter["ln_q_scale"], adapter["ln_q_bias"]
    )
    img = dense(image_feats.astype(x.dtype), adapter["img_proj_fc_w"],
                adapter["img_proj_fc_b"])
    img = dense(quick_gelu(img), adapter["img_proj_out_w"],
                adapter["img_proj_out_b"])
    k = layer_norm(img, adapter["ln_k_scale"], adapter["ln_k_bias"])
    v = layer_norm(img, adapter["ln_v_scale"], adapter["ln_v_bias"])
    out = _cross_attention(q, k, v, adapter, n_head)
    pooled = layer_norm(
        jnp.mean(out, axis=1, keepdims=True),
        adapter["ln_out_scale"], adapter["ln_out_bias"],
    )
    return x.at[:, n_ctx:, :].add(pooled)


def _cross_attention(q_in: jax.Array, k_in: jax.Array, v_in: jax.Array,
                     adapter: dict, n_head: int) -> jax.Array:
    """Standard MHA cross-attention with packed qkv weights: the q slice
    projects the queries, k/v slices project the key/value inputs."""
    d = q_in.shape[-1]
    wq, wk, wv = jnp.split(adapter["w_qkv"], 3, axis=-1)
    bq, bk, bv = jnp.split(adapter["b_qkv"], 3)
    q = split_heads(dense(q_in, wq, bq), n_head)
    k = split_heads(dense(k_in, wk, bk), n_head)
    v = split_heads(dense(v_in, wv, bv), n_head)
    out = attention_xla(q, k, v)
    b, h, l, dh = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
    return dense(out, adapter["w_out"], adapter["b_out"])
