"""Tensor-parallel fused transformer block: per-chip Pallas, psum over 'model'.

Removes the round-3 perf cliff where ``TPU.MESH.MODEL > 1`` force-gated both
Pallas kernels to XLA (the kernels have no GSPMD partitioning rule). The
design keeps every chip running the same VMEM-resident fused kernels as the
single-chip path (:mod:`ovmr_tpu.ops.block_fused`), on its own shard:

- **head-split attention**: chip j holds heads ``[j*H/m, (j+1)*H/m)`` —
  ``w_q/w_k/w_v`` column shards, ``w_out`` row shard. The per-chip kernel
  runs LN1 -> local q/k/v -> local-head attention -> partial output
  projection; the fp32 partials ``psum`` over the 'model' axis, then bias +
  residual add once (Megatron-style column/row parallelism, expressed as
  explicit shard_map collectives instead of NCCL).
- **hidden-split MLP**: chip j holds hidden columns ``[j*4D/m, (j+1)*4D/m)``
  (``c_fc`` column shard incl. its bias slice, ``c_proj`` row shard); LN2 ->
  c_fc -> QuickGELU -> partial c_proj in one kernel, fp32 partial psum +
  ``c_proj_b`` + residual outside.

Storage contract: TP towers replace the packed ``w_qkv [D, 3D]`` /
``b_qkv [3D]`` leaves with ``w_q/w_k/w_v [D, D]`` and ``b_q/b_k/b_v [D]``
(:func:`split_qkv_blocks`). Head counts that do not divide the model axis
(ViT-B's 12 vision heads on model=8, ViT-L's 12 text heads, TINY's 1) are
zero-padded to the next multiple (:func:`pad_head_shards`) — a padded head
is exact zeros forward and backward, so no configuration ever has to fall
back to the kernel-less GSPMD route over head arithmetic. With q/k/v
stored separately, a contiguous
'model'-axis shard of each IS a head group — no permutation anywhere, and
the plain-XLA math on the split layout (:func:`tp_gspmd_block`) is
bit-identical to the packed-matmul block (same contractions, fp32
accumulation), so the GSPMD fallback paths keep exact parity with the
pre-split TP route.

Numerics: identical structure to the single-chip fused block (fp32 LN, bf16
MXU operands with fp32 accumulation, fp32 softmax); the only difference is
the fp32 partial-sum grouping of the two output projections (per-chip
matmul + psum instead of one matmul), which is summation-order noise.

Differentiation: :func:`make_tp_block` blocks carry a custom VJP whose
backward recomputes per chip with XLA math on the local shard (the
recompute-dx policy of ``ops/block_fused``) and psums the dx partials over
'model' — gradients flow through the text tower into prompt embeddings
exactly as on one chip. Tower-PARAMETER cotangents are returned per-chip
(sharded leaves are per-shard-correct; replicated LN/bias leaves psum over
'model') but, as in the single-chip block, are not reduced over the 'data'
axis — every shipped trainer freezes the towers, so they are DCE'd.

Reference parity point: the reference's only parallelism is
``nn.DataParallel`` (``trainers/mm_classifier_one_prompt.py:414-419``); it
has no tensor parallelism at all. The bar here is this repo's own
single-chip fused-kernel numbers (docs/DESIGN.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ovmr_tpu.ops.block_fused import (
    _ATTN_W_CUTOFF,
    _MLP_W_CUTOFF,
    _ln_f32,
    _pick_tile,
    _resident,
    _row,
    _tile_token_limit,
)
from ovmr_tpu.ops.layers import (
    attention_xla,
    dense,
    layer_norm,
    merge_heads,
    quick_gelu,
    split_heads,
)

# --------------------------------------------------------------------------
# layout: packed qkv -> split q/k/v (contiguous 'model' shards = head groups)
# --------------------------------------------------------------------------


def split_qkv_blocks(blocks: dict) -> dict:
    """Packed-qkv block params -> split-qkv TP layout.

    ``w_qkv [..., D, 3D] -> w_q/w_k/w_v [..., D, D]`` (and biases likewise);
    every other leaf passes through. Works on stacked ``[L, ...]`` and
    unstacked per-layer trees."""
    out = {k: v for k, v in blocks.items() if k not in ("w_qkv", "b_qkv")}
    out["w_q"], out["w_k"], out["w_v"] = jnp.split(blocks["w_qkv"], 3, axis=-1)
    out["b_q"], out["b_k"], out["b_v"] = jnp.split(blocks["b_qkv"], 3, axis=-1)
    return out


def pad_head_shards(blocks: dict, head_dim: int, msize: int) -> dict:
    """Zero-pad the split-qkv head axis so the head count becomes a
    multiple of ``msize`` (e.g. ViT-B's 12 heads -> 16 on a model=8 axis).

    Exactness: a padded head has zero ``w_k``/``b_k`` (scores = 0, probs
    uniform) and zero ``w_v``/``b_v`` (head output = probs @ 0 = 0), and its
    ``w_out`` rows are zero, so its partial-projection contribution is an
    exact 0 in every dtype. Backward is exact too: dx flows only through
    the zero ``w_q``/``w_k``/``w_v`` matrices, contributing exact zeros.
    The pad costs ``(pad_heads/n_head)`` extra attention FLOPs spread over
    the mesh — far cheaper than forfeiting the fused kernels entirely."""
    d_attn = blocks["w_q"].shape[-1]
    n_head = d_attn // head_dim
    pad = ((-n_head) % msize) * head_dim
    if pad == 0:
        return blocks
    out = dict(blocks)
    for w, b in (("w_q", "b_q"), ("w_k", "b_k"), ("w_v", "b_v")):
        out[w] = jnp.pad(
            blocks[w], [(0, 0)] * (blocks[w].ndim - 1) + [(0, pad)]
        )
        out[b] = jnp.pad(
            blocks[b], [(0, 0)] * (blocks[b].ndim - 1) + [(0, pad)]
        )
    wo = blocks["w_out"]
    out["w_out"] = jnp.pad(wo, [(0, 0)] * (wo.ndim - 2) + [(0, pad), (0, 0)])
    return out


def split_clip_qkv(clip_params: dict, msize: int = 1, cfg=None) -> dict:
    """Split both towers' stacked blocks (ViT visual + text; ResNet visual
    towers have no transformer blocks and pass through untouched).

    With ``msize > 1`` and a ``cfg`` (a :class:`models.clip.CLIPConfig`),
    each tower whose head count does not divide the model axis is zero-
    padded to the next multiple (:func:`pad_head_shards`) so a contiguous
    'model'-axis shard is always a whole head group."""
    out = dict(clip_params)
    for tower in ("visual", "text"):
        t = clip_params.get(tower)
        if isinstance(t, dict) and isinstance(t.get("blocks"), dict) and (
            "w_qkv" in t["blocks"]
        ):
            t = dict(t)
            blocks = split_qkv_blocks(t["blocks"])
            if msize > 1 and cfg is not None:
                width, heads = (
                    (cfg.vision_width, cfg.vision_heads)
                    if tower == "visual"
                    else (cfg.transformer_width, cfg.transformer_heads)
                )
                blocks = pad_head_shards(blocks, width // heads, msize)
            t["blocks"] = blocks
            out[tower] = t
    return out


# per-leaf 'model'-axis placement of the split layout; the leading dim is
# the stacked layer axis. Used both for NamedSharding placement
# (parallel.mesh.tower_param_shardings) and shard_map in_specs
# (parallel.mesh.clip_pspecs).
TP_BLOCK_AXES = {
    # name -> index of the dim sharded over 'model' (counting AFTER the
    # leading stacked-layer dim), or None for replicated
    "w_q": 1, "w_k": 1, "w_v": 1,       # [L, D, D]   column shards
    "b_q": 0, "b_k": 0, "b_v": 0,       # [L, D]
    "w_out": 0,                          # [L, D, D]   row shard
    "c_fc_w": 1, "c_fc_b": 0,           # [L, D, 4D] / [L, 4D]
    "c_proj_w": 0,                       # [L, 4D, D]  row shard
    "b_out": None, "c_proj_b": None,
    "ln_1_scale": None, "ln_1_bias": None,
    "ln_2_scale": None, "ln_2_bias": None,
}


# --------------------------------------------------------------------------
# per-chip partial kernels (fp32 partial out; bias/residual live outside,
# after the psum)
# --------------------------------------------------------------------------


def _attn_partial_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wout_ref,
    lns_ref, lnb_ref, o_ref, *, n_head: int, mask_ref=None,
):
    x = x_ref[...]  # [G, L, D]
    g, l, d = x.shape
    dtype = x.dtype
    dl = wq_ref.shape[-1]  # local head-shard width
    dh = dl // n_head
    scale = dh ** -0.5

    xln = _ln_f32(x, lns_ref, lnb_ref).astype(dtype)
    flat = xln.reshape(g * l, d)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            flat, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b_ref[0].astype(jnp.float32)).astype(dtype).reshape(g, l, dl)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    head_outs = []
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        scores = (
            jax.lax.dot_general(
                q[:, :, sl], k[:, :, sl],
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [G, L, L] fp32 — VMEM only
        if mask_ref is not None:
            scores = scores + mask_ref[...].astype(jnp.float32)[None]
        probs = jax.nn.softmax(scores, axis=-1)
        head_outs.append(
            jax.lax.dot_general(
                probs.astype(dtype), v[:, :, sl],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    attn = jnp.concatenate(head_outs, axis=-1)  # [G, L, dl]

    part = jax.lax.dot_general(
        attn.reshape(g * l, dl), wout_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # fp32 partial — psum'd by the caller
    o_ref[...] = part.reshape(g, l, d)


def _masked_attn_partial_kernel(
    mask_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wout_ref, lns_ref, lnb_ref, o_ref, *, n_head: int,
):
    _attn_partial_kernel(
        x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wout_ref,
        lns_ref, lnb_ref, o_ref, n_head=n_head, mask_ref=mask_ref,
    )


def _mlp_partial_kernel(
    x_ref, wfc_ref, bfc_ref, wproj_ref, lns_ref, lnb_ref, o_ref
):
    x = x_ref[...]
    g, l, d = x.shape
    dtype = x.dtype

    xln = _ln_f32(x, lns_ref, lnb_ref).astype(dtype)
    h = jax.lax.dot_general(
        xln.reshape(g * l, d), wfc_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + bfc_ref[0].astype(jnp.float32)
    # fp32 QuickGELU, as in the single-chip kernel (Mosaic bf16 logistic)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(dtype)
    part = jax.lax.dot_general(
        h, wproj_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = part.reshape(g, l, d)


def _tp_g_limits(l: int, d: int, dl: int, hl: int, itemsize: int):
    """Batch-tile caps for the partial kernels. vs the single-chip
    ``_g_limits``: the fp32 partial output adds ``l*d*4`` per row, the
    weight shards are 1/m the size (more VMEM headroom)."""
    g_tok = _tile_token_limit(l, d, itemsize)
    per_g_attn = l * d * itemsize * 3 + l * d * 4 + l * l * 4 + 3 * l * dl * itemsize
    per_g_mlp = l * hl * 4 + l * d * itemsize + l * d * 4
    g_attn = max(1, min(16, g_tok, (6 * 1024 * 1024) // max(per_g_attn, 1)))
    g_mlp = max(1, min(16, g_tok, (7 * 1024 * 1024) // max(per_g_mlp, 1)))
    return g_attn, g_mlp


@functools.partial(
    jax.jit, static_argnames=("n_head", "g_limit", "interpret")
)
def tp_attn_half_partial(
    x, w_q, b_q, w_k, b_k, w_v, b_v, w_out,
    ln_s, ln_b,
    mask: Optional[jax.Array] = None,
    n_head: int = 6,
    g_limit: int = 4,
    interpret: bool = False,
):
    """fp32 partial ``attn_local(LN1(x)) @ w_out_local`` for x [B, L, D];
    no bias, no residual — the TP caller psums partials over 'model'."""
    b, l, d = x.shape
    dl = w_q.shape[-1]
    g = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    otile = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * b * l * d * (3 * dl) + 4 * b * l * l * dl + 2 * b * l * dl * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=x.size * x.dtype.itemsize + b * l * d * 4
        + (3 * d * dl + dl * d) * w_q.dtype.itemsize,
        transcendentals=b * l * l * max(n_head, 1) // max(n_head, 1),
    )
    args = [
        x, w_q, _row(b_q), w_k, _row(b_k), w_v, _row(b_v), w_out,
        _row(ln_s), _row(ln_b),
    ]
    in_specs = [
        tile,
        _resident(w_q.shape), _resident((1, dl)),
        _resident(w_k.shape), _resident((1, dl)),
        _resident(w_v.shape), _resident((1, dl)),
        _resident(w_out.shape),
        _resident((1, d)), _resident((1, d)),
    ]
    if mask is None:
        kernel = functools.partial(_attn_partial_kernel, n_head=n_head)
    else:
        kernel = functools.partial(_masked_attn_partial_kernel, n_head=n_head)
        args = [mask.astype(jnp.float32)] + args
        in_specs = [_resident(mask.shape)] + in_specs
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=otile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("g_limit", "interpret"))
def tp_mlp_half_partial(
    x, c_fc_w, c_fc_b, c_proj_w, ln_s, ln_b,
    g_limit: int = 2,
    interpret: bool = False,
):
    """fp32 partial ``QuickGELU(LN2(x) @ c_fc_local + b_local) @
    c_proj_local`` for x [B, L, D]; the hidden shard never leaves VMEM."""
    b, l, d = x.shape
    hl = c_fc_w.shape[-1]
    g = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * b * l * d * hl,
        bytes_accessed=x.size * x.dtype.itemsize + b * l * d * 4
        + (d * hl + hl * d) * c_fc_w.dtype.itemsize,
        transcendentals=b * l * hl,
    )
    return pl.pallas_call(
        _mlp_partial_kernel,
        grid=(b // g,),
        in_specs=[
            tile,
            _resident(c_fc_w.shape), _resident((1, hl)),
            _resident(c_proj_w.shape),
            _resident((1, d)), _resident((1, d)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(x, c_fc_w, _row(c_fc_b), c_proj_w, _row(ln_s), _row(ln_b))


# --------------------------------------------------------------------------
# per-chip XLA math on the split layout (routing fallback + backward)
# --------------------------------------------------------------------------


def _attn_partial_xla(x, p, n_head, mask):
    """fp32 partial of the attention half over this chip's head shard."""
    xln = layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    q = split_heads(dense(xln, p["w_q"], p["b_q"]), n_head)
    k = split_heads(dense(xln, p["w_k"], p["b_k"]), n_head)
    v = split_heads(dense(xln, p["w_v"], p["b_v"]), n_head)
    o = merge_heads(attention_xla(q, k, v, mask))
    return jnp.dot(
        o, p["w_out"].astype(o.dtype), preferred_element_type=jnp.float32
    )


def _mlp_partial_xla(y, p):
    """fp32 partial of the MLP half over this chip's hidden shard."""
    yln = layer_norm(y, p["ln_2_scale"], p["ln_2_bias"])
    h = quick_gelu(dense(yln, p["c_fc_w"], p["c_fc_b"]))
    return jnp.dot(
        h, p["c_proj_w"].astype(h.dtype), preferred_element_type=jnp.float32
    )


def tp_gspmd_block(x, p, n_head, mask=None):
    """Global-view XLA block on the SPLIT-qkv layout, for plain-jit GSPMD
    contexts (ragged-batch fallbacks, zero-shot text encode). Same math as
    ``ops.layers.residual_attention_block`` — q/k/v as three matmuls
    instead of one packed one, identical contractions and fp32
    accumulation. With the split leaves TP-placed, XLA partitions the
    matmuls over 'model' (Megatron split) automatically.

    ``n_head`` is the model's (unpadded) head count; the effective count is
    re-derived from the leaf shapes so head-padded layouts
    (:func:`pad_head_shards` — exact zeros) run unchanged."""
    n_head = p["w_q"].shape[-1] // (x.shape[-1] // n_head)
    xln = layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    q = split_heads(dense(xln, p["w_q"], p["b_q"]), n_head)
    k = split_heads(dense(xln, p["w_k"], p["b_k"]), n_head)
    v = split_heads(dense(xln, p["w_v"], p["b_v"]), n_head)
    o = merge_heads(attention_xla(q, k, v, mask))
    x = x + dense(o, p["w_out"], p["b_out"])
    h = quick_gelu(
        dense(layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p["c_fc_w"],
              p["c_fc_b"])
    )
    return x + dense(h, p["c_proj_w"], p["c_proj_b"])


def tp_gspmd_block_remat(x, p, n_head, mask=None):
    """Per-layer-remat variant for the differentiated text tower (same
    policy as ``ops.layers.residual_block_remat``)."""
    return jax.checkpoint(
        lambda x_, p_: tp_gspmd_block(x_, p_, n_head, mask)
    )(x, p)


# --------------------------------------------------------------------------
# the per-chip TP block (call INSIDE a shard_map manual over `axis`)
# --------------------------------------------------------------------------


def _tp_flavor(x, p, interpret):
    """Static routing: per-chip Pallas vs per-chip XLA partials."""
    d = x.shape[-1]
    dl = p["w_q"].shape[-1]
    hl = p["c_fc_w"].shape[-1]
    itemsize = x.dtype.itemsize
    unfused = (
        p["w_q"].dtype == jnp.int8
        or x.dtype == jnp.float16
        or (
            not interpret
            and (
                jax.default_backend() != "tpu"
                or d % 128 != 0
                or dl % 128 != 0
                or hl % 128 != 0
            )
        )
    )
    attn_w = (3 * d * dl + dl * d) * itemsize
    mlp_w = (d * hl + hl * d) * itemsize
    return unfused, attn_w, mlp_w


def _tp_halves(x, p, nh_local, mask, interpret):
    """(attn_partial_fn, mlp_partial_fn) per the static routing."""
    unfused, attn_w, mlp_w = _tp_flavor(x, p, interpret)
    l, d = x.shape[-2], x.shape[-1]
    dl = p["w_q"].shape[-1]
    hl = p["c_fc_w"].shape[-1]
    g_attn, g_mlp = _tp_g_limits(l, d, dl, hl, x.dtype.itemsize)

    if not unfused and attn_w <= _ATTN_W_CUTOFF:
        def attn_part(x_):
            return tp_attn_half_partial(
                x_, p["w_q"], p["b_q"], p["w_k"], p["b_k"], p["w_v"],
                p["b_v"], p["w_out"], p["ln_1_scale"], p["ln_1_bias"],
                mask=mask, n_head=nh_local, g_limit=g_attn,
                interpret=interpret,
            )
    else:
        def attn_part(x_):
            return _attn_partial_xla(x_, p, nh_local, mask)

    if not unfused and mlp_w <= _MLP_W_CUTOFF:
        def mlp_part(y_):
            return tp_mlp_half_partial(
                y_, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"],
                p["ln_2_scale"], p["ln_2_bias"], g_limit=g_mlp,
                interpret=interpret,
            )
    else:
        def mlp_part(y_):
            return _mlp_partial_xla(y_, p)

    return attn_part, mlp_part


def _tp_block_fwd_impl(x, p, nh_local, mask, axis, interpret, want_y=False):
    attn_part, mlp_part = _tp_halves(x, p, nh_local, mask, interpret)
    dtype = x.dtype
    y = x + (
        jax.lax.psum(attn_part(x), axis)
        + p["b_out"].astype(jnp.float32)
    ).astype(dtype)
    z = y + (
        jax.lax.psum(mlp_part(y), axis)
        + p["c_proj_b"].astype(jnp.float32)
    ).astype(dtype)
    return (z, y) if want_y else z


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5))
def _tp_block(x, p, nh_local, mask, axis, interpret):
    return _tp_block_fwd_impl(x, p, nh_local, mask, axis, interpret)


def _tp_block_fwd(x, p, nh_local, mask, axis, interpret):
    z, y = _tp_block_fwd_impl(
        x, p, nh_local, mask, axis, interpret, want_y=True
    )
    return z, (x, y, p, mask)


def _tp_block_bwd(nh_local, axis, interpret, res, g):
    """Per-chip recompute backward (XLA math on the local shard), dx
    partials psum'd over `axis`. Tower-parameter cotangents: sharded
    leaves are per-shard-correct; replicated leaves psum over `axis`;
    nothing reduces over 'data' (callers pmean trainable grads — towers
    are frozen in every shipped trainer, so dp is DCE'd)."""
    x, y, p, mask = res
    gf = g.astype(jnp.float32)

    _, vjp_m = jax.vjp(lambda y_, p_: _mlp_partial_xla(y_, p_), y, p)
    dy_c, dp_m = vjp_m(gf)
    dy = g + jax.lax.psum(dy_c.astype(jnp.float32), axis).astype(g.dtype)
    dyf = dy.astype(jnp.float32)

    _, vjp_a = jax.vjp(
        lambda x_, p_: _attn_partial_xla(x_, p_, nh_local, mask), x, p
    )
    dx_c, dp_a = vjp_a(dyf)
    dx = dy + jax.lax.psum(dx_c.astype(jnp.float32), axis).astype(g.dtype)

    dp = jax.tree_util.tree_map(jnp.add, dp_m, dp_a)
    dp["b_out"] = dyf.sum(tuple(range(dyf.ndim - 1))).astype(p["b_out"].dtype)
    dp["c_proj_b"] = gf.sum(tuple(range(gf.ndim - 1))).astype(
        p["c_proj_b"].dtype
    )
    for k in ("ln_1_scale", "ln_1_bias", "ln_2_scale", "ln_2_bias"):
        dp[k] = jax.lax.psum(dp[k], axis)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dx, dp, dmask


_tp_block.defvjp(_tp_block_fwd, _tp_block_bwd)


def make_tp_block(model_size: int, axis: str = "model", interpret: bool = False):
    """Per-chip TP block function for split-layout param SHARDS.

    Returns ``block_fn(h, layer_params, n_head, mask)`` with the standard
    block signature. ``n_head`` is the GLOBAL unpadded head count; it only
    fixes the head dim (``D // n_head``) — the local head count comes from
    the shard's own ``w_q`` width, so head-padded layouts
    (:func:`pad_head_shards`) run the same kernels with exact-zero pad
    heads. Must be called inside a shard_map region manual over `axis`
    whose in_specs shard the block leaves per :data:`TP_BLOCK_AXES`.
    Differentiable (recompute VJP, explicit psums).
    """

    def block_fn(h, layer_params, n_head, mask=None):
        d = h.shape[-1]
        if d % n_head:
            raise ValueError(
                f"width {d} not divisible by n_head={n_head}"
            )
        head_dim = d // n_head
        dl = layer_params["w_q"].shape[-1]
        if dl % head_dim:
            raise ValueError(
                f"local q shard width {dl} not divisible by the head dim "
                f"{head_dim}; split/pad the towers with split_clip_qkv "
                f"(model axis {model_size})"
            )
        return _tp_block(
            h, layer_params, dl // head_dim, mask, axis, interpret
        )

    return block_fn
