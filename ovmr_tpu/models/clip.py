"""Functional CLIP towers (ViT image encoder + causal text encoder).

A from-scratch TPU-native re-design of the reference CLIP core
(``clip/model.py:360-428`` VisionTransformer, ``:715-833`` CLIP/encode_text):

- pure functions over a parameter pytree (no module state);
- transformer blocks are STACKED along a leading layer axis and executed
  with ``lax.scan`` — one compiled block body regardless of depth, fast
  compiles, and natural rematerialisation points;
- patch embedding is a reshape + single MXU matmul (a stride-p conv with
  kernel p is exactly that), instead of an im2col convolution;
- activations run batch-major ``[B, L, D]`` (no NLD->LND permutes);
- LayerNorm computes in fp32, matmuls accumulate in fp32
  (see :mod:`ovmr_tpu.ops.layers`).

Weight layout intentionally right-multiplies (``x @ W``, W stored [in, out]);
:mod:`ovmr_tpu.models.import_torch` transposes torch checkpoints on import.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ovmr_tpu.ops.layers import (
    attention_xla,
    causal_mask,
    layer_norm,
    residual_attention_block,
)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision: int layer count = ViT; 4-tuple of stage depths = ModifiedResNet
    image_resolution: int = 224
    vision_layers: object = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, tuple)

    @property
    def vision_heads(self) -> int:
        if self.is_resnet:
            # reference: vision_heads = vision_width * 32 // 64
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


VIT_B16 = CLIPConfig()
VIT_B32 = CLIPConfig(vision_patch_size=32)
VIT_L14 = CLIPConfig(
    embed_dim=768,
    vision_layers=24,
    vision_width=1024,
    vision_patch_size=14,
    transformer_width=768,
    transformer_heads=12,
    transformer_layers=12,
)
VIT_L14_336 = CLIPConfig(
    embed_dim=768,
    image_resolution=336,
    vision_layers=24,
    vision_width=1024,
    vision_patch_size=14,
    transformer_width=768,
    transformer_heads=12,
    transformer_layers=12,
)

# test-scale ModifiedResNet config: vision tower shaped like the recorded
# golden fixture's (tests/fixtures/clip_rn_tiny_golden.npz sniffs layers
# (1,1,1,1)/width 8/res 64); the text tower is TINY-sized with the REAL
# vocab so the CLI can smoke-run the full ResNet trainer surface on CPU
# (the fixture's own text tower is 128-wide/512-vocab — load it through
# the importer's shape sniffer, not by this name)
TINY_RN = CLIPConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_patch_size=0,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
)

# test-scale TP config: like TINY but with vision_width 128 so BOTH towers'
# head counts (2) divide a model axis of 2 — the smallest shape where the
# split-QKV TP-pallas route engages (TINY's single vision head cannot
# head-split, so it exercises the legacy gspmd TP route instead)
TINY_TP = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=128,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
)

# test-scale config: tiny everything, exercised against torch goldens
TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
)

# ModifiedResNet family (public OpenAI CLIP architecture hyperparameters,
# recoverable from the checkpoints' state-dict shapes — reference
# ``clip/model.py:870-886`` build_model)
RN50 = CLIPConfig(
    embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
    vision_patch_size=0,
)
RN101 = CLIPConfig(
    embed_dim=512, vision_layers=(3, 4, 23, 3), vision_width=64,
    vision_patch_size=0,
)
RN50x4 = CLIPConfig(
    embed_dim=640, image_resolution=288, vision_layers=(4, 6, 10, 6),
    vision_width=80, vision_patch_size=0,
    transformer_width=640, transformer_heads=10,
)
RN50x16 = CLIPConfig(
    embed_dim=768, image_resolution=384, vision_layers=(6, 8, 18, 8),
    vision_width=96, vision_patch_size=0,
    transformer_width=768, transformer_heads=12,
)
RN50x64 = CLIPConfig(
    embed_dim=1024, image_resolution=448, vision_layers=(3, 15, 36, 10),
    vision_width=128, vision_patch_size=0,
    transformer_width=1024, transformer_heads=16,
)

CONFIGS = {
    "ViT-B/16": VIT_B16,
    "ViT-B/32": VIT_B32,
    "ViT-L/14": VIT_L14,
    "ViT-L/14@336px": VIT_L14_336,
    "RN50": RN50,
    "RN101": RN101,
    "RN50x4": RN50x4,
    "RN50x16": RN50x16,
    "RN50x64": RN50x64,
    "TINY": TINY,
    "TINY_TP": TINY_TP,
    "TINY_RN": TINY_RN,
}


# --------------------------------------------------------------------------
# parameter init (mirrors reference CLIP.initialize_parameters semantics)
# --------------------------------------------------------------------------

def _init_blocks(key: jax.Array, n_layers: int, width: int, dtype) -> dict:
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(key, 4)
    normal = jax.random.normal
    return {
        "w_qkv": (normal(ks[0], (n_layers, width, 3 * width)) * attn_std).astype(dtype),
        "b_qkv": jnp.zeros((n_layers, 3 * width), dtype),
        "w_out": (normal(ks[1], (n_layers, width, width)) * proj_std).astype(dtype),
        "b_out": jnp.zeros((n_layers, width), dtype),
        "ln_1_scale": jnp.ones((n_layers, width), dtype),
        "ln_1_bias": jnp.zeros((n_layers, width), dtype),
        "c_fc_w": (normal(ks[2], (n_layers, width, 4 * width)) * fc_std).astype(dtype),
        "c_fc_b": jnp.zeros((n_layers, 4 * width), dtype),
        "c_proj_w": (normal(ks[3], (n_layers, 4 * width, width)) * proj_std).astype(dtype),
        "c_proj_b": jnp.zeros((n_layers, width), dtype),
        "ln_2_scale": jnp.ones((n_layers, width), dtype),
        "ln_2_bias": jnp.zeros((n_layers, width), dtype),
    }


def init_params(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    (kv, kt, kvb, ktb, kp, ke, kpe, ktp, kte) = jax.random.split(key, 9)
    vw, tw = cfg.vision_width, cfg.transformer_width
    vscale = vw ** -0.5
    normal = jax.random.normal
    if cfg.is_resnet:
        from ovmr_tpu.models.resnet import init_resnet_visual

        visual = init_resnet_visual(kv, cfg, dtype)
    else:
        patch_in = 3 * cfg.vision_patch_size * cfg.vision_patch_size
        visual = {
            "patch_embed_w": (normal(kp, (patch_in, vw)) * vscale).astype(dtype),
            "class_embedding": (normal(kv, (vw,)) * vscale).astype(dtype),
            "positional_embedding": (
                normal(kpe, (cfg.num_patches + 1, vw)) * vscale
            ).astype(dtype),
            "ln_pre_scale": jnp.ones((vw,), dtype),
            "ln_pre_bias": jnp.zeros((vw,), dtype),
            "blocks": _init_blocks(kvb, cfg.vision_layers, vw, dtype),
            "ln_post_scale": jnp.ones((vw,), dtype),
            "ln_post_bias": jnp.zeros((vw,), dtype),
            "proj": (normal(kt, (vw, cfg.embed_dim)) * vscale).astype(dtype),
        }
    text = {
        "token_embedding": (normal(ke, (cfg.vocab_size, tw)) * 0.02).astype(dtype),
        "positional_embedding": (
            normal(kte, (cfg.context_length, tw)) * 0.01
        ).astype(dtype),
        "blocks": _init_blocks(ktb, cfg.transformer_layers, tw, dtype),
        "ln_final_scale": jnp.ones((tw,), dtype),
        "ln_final_bias": jnp.zeros((tw,), dtype),
        "text_projection": (normal(ktp, (tw, cfg.embed_dim)) * tw ** -0.5).astype(
            dtype
        ),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


# --------------------------------------------------------------------------
# forward passes
# --------------------------------------------------------------------------

def run_blocks(
    x: jax.Array,
    blocks: dict,
    n_head: int,
    mask: Optional[jax.Array] = None,
    attn_fn=attention_xla,
    block_fn=None,
) -> jax.Array:
    """lax.scan over the stacked transformer blocks.

    ``block_fn(h, layer_params, n_head, mask)`` overrides the whole
    residual block (the fused Pallas path, ops/block_fused); default is the
    XLA-math block parameterized by ``attn_fn``."""

    def body(h, layer_params):
        if block_fn is not None:
            h = block_fn(h, layer_params, n_head, mask)
        else:
            h = residual_attention_block(h, layer_params, n_head, mask, attn_fn)
        return h, None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def padded_len(length: int) -> int:
    """Tile-aligned sequence length for the transformer stack.

    Measured on v5e (controlled interleaved A/B, ViT-B/16 batch 256, warm):
    no padding 100.1 ms, pad-to-208 105.5 ms, pad-to-256 ~127 ms — XLA
    already handles the ragged 197-token layout well inside the full
    program (isolated micro-benchmarks suggesting otherwise were cold-
    compile artifacts). Padding is therefore DISABLED; the masked-padding
    machinery below stays for configs where an aligned length wins."""
    return length


def vision_pad_mask(real: int, padded: int) -> Optional[jax.Array]:
    """Additive attention mask for zero-padded vision tokens: real queries
    never attend to pad keys; pad queries attend only to token 0 (keeps
    their rows finite so no NaN can leak through later layers)."""
    if padded == real:
        return None
    mask = jnp.zeros((padded, padded), jnp.float32)
    mask = mask.at[:, real:].set(-jnp.inf)
    mask = mask.at[real:, 1:].set(-jnp.inf)
    return mask


def patch_embed(
    images: jax.Array, w: jax.Array, patch: int, layout: str = "NCHW"
) -> jax.Array:
    """Images (NCHW or NHWC) -> [B, n_patches, width] via a stride-p conv.

    The conv lowering is the fast path on TPU (an explicit 6D
    reshape/transpose im2col measured 24x slower and pathologically slow to
    compile). `w` stays in the importer's [3*p*p, width] layout. NHWC input
    skips a relayout when paired with the NHWC augmentation output."""
    out = patch_embed_grid(images, w, patch, layout)
    b, gh, gw, width = out.shape
    return out.reshape(b, gh * gw, width)


def patch_embed_grid(
    images: jax.Array, w: jax.Array, patch: int, layout: str = "NCHW"
) -> jax.Array:
    """:func:`patch_embed` keeping the spatial grid: [B, gh, gw, width]."""
    width = w.shape[1]
    kernel = w.T.reshape(width, 3, patch, patch).astype(images.dtype)
    out = jax.lax.conv_general_dilated(
        images,
        kernel,
        window_strides=(patch, patch),
        padding="VALID",
        dimension_numbers=(layout, "OIHW", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # [B, gh, gw, width]
    return out.astype(images.dtype)


def resize_pos_embed(pe: jax.Array, grid: int, gh: int, gw: int) -> jax.Array:
    """Bilinear-resize a [1+grid^2, D] ViT positional-embedding table to a
    [1+gh*gw, D] table for a gh x gw patch grid (CLS row untouched) — the
    standard ViT trick for feeding resolutions the tower was not built
    for, e.g. `DATALOADER.MULTI_RES_COLLATE` batches. fp32 interpolation;
    identity when (gh, gw) == (grid, grid)."""
    if (gh, gw) == (grid, grid):
        return pe
    cls_row, spatial = pe[:1], pe[1:]
    spatial = spatial.reshape(grid, grid, -1).astype(jnp.float32)
    resized = jax.image.resize(
        spatial, (gh, gw, spatial.shape[-1]), method="bilinear"
    )
    return jnp.concatenate(
        [cls_row, resized.reshape(gh * gw, -1).astype(pe.dtype)], axis=0
    )


def encode_image(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    attn_fn=attention_xla,
    layout: str = "NCHW",
    block_fn=None,
) -> jax.Array:
    """Image tower forward. ViT: conv patchify -> +cls/pos -> ln_pre ->
    blocks (optionally tile-padded sequence) -> ln_post[0] @ proj
    (reference ``clip/model.py:411-428``). ResNet backbones dispatch to
    :mod:`ovmr_tpu.models.resnet`. Returns [B, embed_dim].
    """
    if cfg.is_resnet:
        from ovmr_tpu.models.resnet import encode_image_resnet

        if layout == "NHWC":
            images = images.transpose(0, 3, 1, 2)
        return encode_image_resnet(params, images, cfg.vision_heads)

    v = params["visual"]
    dtype = v["patch_embed_w"].dtype
    xg = patch_embed_grid(
        images.astype(dtype), v["patch_embed_w"], cfg.vision_patch_size, layout
    )
    b, gh, gw, width = xg.shape
    x = xg.reshape(b, gh * gw, width)
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dtype), (b, 1, width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    # off-native resolutions (MULTI_RES_COLLATE batches) get a bilinear-
    # resized positional table; native is the untouched identity path
    x = x + resize_pos_embed(
        v["positional_embedding"], cfg.grid_size, gh, gw
    ).astype(dtype)
    x = layer_norm(x, v["ln_pre_scale"], v["ln_pre_bias"])

    real = x.shape[1]
    lp = padded_len(real)
    if lp != real:
        x = jnp.pad(x, ((0, 0), (0, lp - real), (0, 0)))
    mask = vision_pad_mask(real, lp)

    x = run_blocks(
        x, v["blocks"], cfg.vision_heads, mask=mask, attn_fn=attn_fn,
        block_fn=block_fn,
    )
    pooled = layer_norm(x[:, 0, :], v["ln_post_scale"], v["ln_post_bias"])
    return jnp.dot(
        pooled, v["proj"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def encode_text(
    params: dict, cfg: CLIPConfig, tokens: jax.Array, attn_fn=attention_xla,
    block_fn=None,
) -> jax.Array:
    """Text forward on token ids [B, 77]; EOT feature via argmax gather
    (reference ``clip/model.py:820-833``)."""
    t = params["text"]
    dtype = t["token_embedding"].dtype
    x = jnp.take(t["token_embedding"], tokens, axis=0).astype(dtype)
    eos_index = jnp.argmax(tokens, axis=-1)
    return encode_text_embeds(
        params, cfg, x, eos_index, attn_fn=attn_fn, block_fn=block_fn
    )


def encode_text_embeds(
    params: dict,
    cfg: CLIPConfig,
    embeds: jax.Array,
    eos_index: jax.Array,
    attn_fn=attention_xla,
    block_fn=None,
) -> jax.Array:
    """Prompt-side text forward on pre-built embeddings [B, L, D]:
    positional embedding sliced to L, explicit EOT gather index
    (reference ``trainers/mm_classifier_one_prompt.py:63-91``)."""
    t = params["text"]
    dtype = embeds.dtype
    length = embeds.shape[1]
    x = embeds + t["positional_embedding"][:length].astype(dtype)

    # tile-align the sequence (zero rows; the causal mask already blocks
    # every real query from the pad keys, which are all "future")
    lp = padded_len(length)
    if lp != length:
        x = jnp.pad(x, ((0, 0), (0, lp - length), (0, 0)))
    mask = causal_mask(lp)

    x = run_blocks(
        x, t["blocks"], cfg.transformer_heads, mask=mask, attn_fn=attn_fn,
        block_fn=block_fn,
    )
    x = layer_norm(x, t["ln_final_scale"], t["ln_final_bias"])
    pooled = jnp.take_along_axis(
        x, eos_index.reshape(-1, 1, 1).astype(jnp.int32), axis=1
    )[:, 0, :]
    return jnp.dot(
        pooled, t["text_projection"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def embed_tokens(params: dict, tokens: jax.Array) -> jax.Array:
    """Token-embedding lookup [B, L] -> [B, L, D] (host of prompt splicing)."""
    emb = params["text"]["token_embedding"]
    return jnp.take(emb, tokens, axis=0)


@partial(jax.jit, static_argnames=("cfg",))
def clip_forward(params: dict, cfg: CLIPConfig, images: jax.Array, tokens: jax.Array):
    """Contrastive forward (reference ``clip/model.py:835-849``):
    returns (logits_per_image, logits_per_text)."""
    from ovmr_tpu.ops.layers import l2_normalize

    img = l2_normalize(encode_image(params, cfg, images))
    txt = l2_normalize(encode_text(params, cfg, tokens))
    scale = jnp.exp(params["logit_scale"]).astype(img.dtype)
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


def cast_params(params: dict, dtype) -> dict:
    """Cast floating leaves to `dtype`, keeping logit_scale and quantization
    scales fp32 (matches reference convert_weights keeping LN fp32-computed;
    LN params can be low precision since layer_norm upcasts)."""

    # exactly the int8 dequantization scale keys — NOT LayerNorm *_scale
    quant_scale_keys = {"w_qkv_scale", "w_out_scale", "c_fc_w_scale", "c_proj_w_scale"}

    def cast(tree):
        def leaf(path, x):
            if not jnp.issubdtype(x.dtype, jnp.floating):
                return x
            if path and str(getattr(path[-1], "key", "")) in quant_scale_keys:
                return x  # int8 dequantization scales stay fp32
            return x.astype(dtype)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    out = {k: cast(v) for k, v in params.items() if k != "logit_scale"}
    out["logit_scale"] = params["logit_scale"]
    return out
