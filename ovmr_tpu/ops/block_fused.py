"""Block-level Pallas fusion for the CLIP transformer layers.

Two kernels replace the whole pre-LN residual block
(reference ``clip/model.py:167-217``):

- **attention half** (`fused_attn_half`): LN1 -> packed QKV matmul ->
  per-head attention (bf16 MXU matmuls, fp32 softmax) -> output projection
  -> residual add, one VMEM-resident program per G-image tile. The [L, L]
  score matrices never touch HBM, and neither does the LN1 output or the
  QKV tensor.
- **MLP half** (`fused_mlp_half`): LN2 -> c_fc -> QuickGELU -> c_proj ->
  residual add. The 4x-width hidden activation (310 MB/layer at ViT-B
  batch 256) lives only in VMEM.

vs the round-1 attention-only kernel (ops/attention.py), which lost to XLA
in-program: matmuls here keep bf16 operands with fp32 accumulation (the old
kernel upcast Q/K to fp32 and paid the fp32 MXU rate), the grid works on
G-image tiles instead of one (batch*head) slice per program, and the whole
block's intermediates stay on-chip instead of just the attention ones.

Numerics contract is identical to ops/layers.residual_attention_block
(fp32 LayerNorm, fp32 matmul accumulation, fp32 softmax, QuickGELU in the
activation dtype) — parity-tested against it. Differentiable via custom
VJP that recomputes the backward with the XLA-math path (same trick as
ops/attention.py; the text tower is differentiated through in training).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(batch: int, limit: int) -> int:
    """Largest divisor of `batch` that is <= limit (>=1)."""
    g = min(batch, max(limit, 1))
    while batch % g:
        g -= 1
    return g


def _ln_f32(x, scale_ref, bias_ref, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + eps)
    return y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32
    )


def _attn_half_kernel(
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
    o_ref, *, n_head: int, mask_ref=None,
):
    x = x_ref[...]  # [G, L, D]
    g, l, d = x.shape
    dtype = x.dtype
    dh = d // n_head
    scale = dh ** -0.5

    xln = _ln_f32(x, lns_ref, lnb_ref).astype(dtype)
    qkv = jax.lax.dot_general(
        xln.reshape(g * l, d),
        wqkv_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dtype)
    qkv = qkv.reshape(g, l, 3 * d)

    head_outs = []
    for h in range(n_head):
        qh = qkv[:, :, h * dh : (h + 1) * dh]
        kh = qkv[:, :, d + h * dh : d + (h + 1) * dh]
        vh = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        scores = (
            jax.lax.dot_general(
                qh, kh,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [G, L, L] fp32 — never leaves VMEM
        if mask_ref is not None:
            scores = scores + mask_ref[...].astype(jnp.float32)[None]
        probs = jax.nn.softmax(scores, axis=-1)
        head_outs.append(
            jax.lax.dot_general(
                probs.astype(dtype), vh,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    attn = jnp.concatenate(head_outs, axis=-1)  # [G, L, D]

    proj = jax.lax.dot_general(
        attn.reshape(g * l, d),
        wout_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    proj = (proj + bout_ref[0].astype(jnp.float32)).astype(dtype)
    o_ref[...] = x + proj.reshape(g, l, d)


def _masked_attn_half_kernel(
    mask_ref, x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref,
    lnb_ref, o_ref, *, n_head: int,
):
    _attn_half_kernel(
        x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
        o_ref, n_head=n_head, mask_ref=mask_ref,
    )


def _mlp_half_kernel(
    x_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, lns_ref, lnb_ref, o_ref
):
    x = x_ref[...]  # [G, L, D]
    g, l, d = x.shape
    dtype = x.dtype
    hidden = wfc_ref.shape[-1]

    xln = _ln_f32(x, lns_ref, lnb_ref).astype(dtype)
    h = jax.lax.dot_general(
        xln.reshape(g * l, d),
        wfc_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + bfc_ref[0].astype(jnp.float32)
    # QuickGELU in fp32 (Mosaic's bf16 logistic lowering mis-verifies on
    # this jax version; fp32 compute then cast is within bf16 rounding of
    # the XLA path's dtype-native sigmoid)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(dtype)
    out = jax.lax.dot_general(
        h, wproj_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (out + bproj_ref[0].astype(jnp.float32)).astype(dtype)
    o_ref[...] = x + out.reshape(g, l, d)
    del hidden


def _resident(shape):
    """Weight block: whole array, same block for every grid step (fetched
    once, stays in VMEM across the grid)."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _row(p):
    return p.reshape(1, -1)


@functools.partial(
    jax.jit, static_argnames=("n_head", "g_limit", "interpret")
)
def fused_attn_half(
    x, w_qkv, b_qkv, w_out, b_out, ln_s, ln_b,
    mask: Optional[jax.Array] = None,
    n_head: int = 12,
    g_limit: int = 4,
    interpret: bool = False,
):
    """x + proj(attention(LN1(x))) for x [B, L, D]."""
    b, l, d = x.shape
    g = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * b * l * d * (3 * d + d) + 4 * b * l * l * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * x.size * x.dtype.itemsize
        + (w_qkv.size + w_out.size) * w_qkv.dtype.itemsize,
        transcendentals=b * l * l,
    )
    args = [
        x, w_qkv, _row(b_qkv), w_out, _row(b_out), _row(ln_s), _row(ln_b)
    ]
    in_specs = [
        tile,
        _resident(w_qkv.shape),
        _resident((1, b_qkv.shape[0])),
        _resident(w_out.shape),
        _resident((1, b_out.shape[0])),
        _resident((1, ln_s.shape[0])),
        _resident((1, ln_b.shape[0])),
    ]
    if mask is None:
        kernel = functools.partial(_attn_half_kernel, n_head=n_head)
    else:
        kernel = functools.partial(_masked_attn_half_kernel, n_head=n_head)
        args = [mask.astype(jnp.float32)] + args
        in_specs = [_resident(mask.shape)] + in_specs
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("g_limit", "interpret"))
def fused_mlp_half(
    x, c_fc_w, c_fc_b, c_proj_w, c_proj_b, ln_s, ln_b,
    g_limit: int = 2,
    interpret: bool = False,
):
    """x + c_proj(QuickGELU(c_fc(LN2(x)))) for x [B, L, D]."""
    b, l, d = x.shape
    hidden = c_fc_w.shape[-1]
    g = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * b * l * d * hidden,
        bytes_accessed=2 * x.size * x.dtype.itemsize
        + (c_fc_w.size + c_proj_w.size) * c_fc_w.dtype.itemsize,
        transcendentals=b * l * hidden,
    )
    return pl.pallas_call(
        _mlp_half_kernel,
        grid=(b // g,),
        in_specs=[
            tile,
            _resident(c_fc_w.shape),
            _resident((1, hidden)),
            _resident(c_proj_w.shape),
            _resident((1, d)),
            _resident((1, d)),
            _resident((1, d)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, c_fc_w, _row(c_fc_b), c_proj_w, _row(c_proj_b), _row(ln_s), _row(ln_b))


def _mlp_half_chunked_kernel(
    x_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref, lns_ref, lnb_ref, o_ref,
    xln_ref,
):
    """MLP half with hidden-dim-chunked weights: grid (batch tiles, hidden
    chunks); partial c_proj products accumulate into the output block. The
    LN result is computed once per batch tile (chunk 0) into scratch."""
    j = pl.program_id(1)
    x = x_ref[...]
    g, l, d = x.shape
    dtype = x.dtype

    @pl.when(j == 0)
    def _():
        xln_ref[...] = _ln_f32(x, lns_ref, lnb_ref).astype(dtype)
        # residual + (once) the c_proj bias
        o_ref[...] = x + jnp.broadcast_to(
            bproj_ref[0].astype(jnp.float32), x.shape
        ).astype(dtype)

    xln = xln_ref[...]
    h = jax.lax.dot_general(
        xln.reshape(g * l, d),
        wfc_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + bfc_ref[0].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(dtype)
    part = jax.lax.dot_general(
        h, wproj_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o_ref[...] + part.reshape(g, l, d).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("g_limit", "chunks", "interpret")
)
def fused_mlp_half_chunked(
    x, c_fc_w, c_fc_b, c_proj_w, c_proj_b, ln_s, ln_b,
    g_limit: int = 1,
    chunks: int = 4,
    interpret: bool = False,
):
    """MLP half for towers whose MLP weights exceed the VMEM residency
    cutoff (ViT-L/14: 16.8 MB bf16): weights stream in `chunks` hidden-dim
    slices while the hidden activation still never touches HBM."""
    b, l, d = x.shape
    hidden = c_fc_w.shape[-1]
    while hidden % chunks:
        chunks += 1
    hc = hidden // chunks
    g = _pick_tile(b, g_limit)
    tile = pl.BlockSpec(
        (g, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=4 * b * l * d * hidden,
        bytes_accessed=2 * x.size * x.dtype.itemsize
        + (c_fc_w.size + c_proj_w.size) * c_fc_w.dtype.itemsize,
        transcendentals=b * l * hidden,
    )
    return pl.pallas_call(
        _mlp_half_chunked_kernel,
        grid=(b // g, chunks),
        in_specs=[
            tile,
            pl.BlockSpec((d, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((g, l, d), x.dtype)],
        cost_estimate=cost,
        interpret=interpret,
    )(x, c_fc_w, _row(c_fc_b), c_proj_w, _row(c_proj_b), _row(ln_s), _row(ln_b))


# --------------------------------------------------------------------------
# differentiable block: Pallas forward, exact XLA-math backward
# --------------------------------------------------------------------------


# weight-residency cutoffs: each half keeps its weights in VMEM across the
# grid; oversized halves (int8 serving weights, fp16 activations, >9 MB
# attention weights) fall back to XLA. Decisions are static at trace time.
# Measured ViT-L/14 recipe (batch 128 interleaved A/B, docs/DESIGN.md,
# tools/ab_vitl2.py): fused attention @ g=2 + fully-RESIDENT 16.8 MB MLP
# @ g=2 = 142.3 ms vs 155.1 for the round-2 chunked recipe vs 220 XLA; the
# chunked MLP survives only as the >_MLP_W_RESIDENT_FWD fallback (and it
# measured slower than XLA WITHOUT a fused attention half, so it still
# only engages alongside one).
_ATTN_W_CUTOFF = 9 * 1024 * 1024
_ATTN_W_SMALL = 6 * 1024 * 1024  # above this, cap tiles at g=2 (measured)
_MLP_W_CUTOFF = 10 * 1024 * 1024
# forward-only big-MLP residency tier (ViT-L 16.8 MB): the dx backward
# kernels keep the stricter _MLP_W_CUTOFF (only text towers — all under
# 10 MB — are ever differentiated; see _fused_block_bwd)
_MLP_W_RESIDENT_FWD = 18 * 1024 * 1024
_TILE_BYTES = 6 * 1024 * 1024


# Mosaic's scoped-VMEM peak tracks the sublane-padded x-tile footprint, not
# just the live-byte estimates below. On-chip anchor points (bf16):
# ViT-B/32 g=16 (16 x 56pad x 768 = 1.376 MB) overflows scoped VMEM by
# 1.16 MB, while ViT-B/16 g=4 (4 x 200 x 768 = 1.229 MB) and the text
# tower's g=16 (16 x 80 x 512 = 1.311 MB — the shipped classifier-gen
# recipe) both compile and win. Cap padded-tile bytes just above the
# largest proven-good point.
_TILE_X_BYTES = 16 * 80 * 512 * 2


def _tile_token_limit(l: int, d: int, itemsize: int) -> int:
    """Max images/prompts per tile for the padded x-tile byte envelope."""
    l_pad = -8 * (-l // 8)
    return max(1, _TILE_X_BYTES // (l_pad * d * itemsize))


def _g_limits(l: int, d: int, hidden: int, itemsize: int):
    g_tok = _tile_token_limit(l, d, itemsize)
    per_g_attn = l * d * itemsize * 4 + l * l * 4
    per_g_mlp = l * hidden * 4 + l * d * itemsize * 2
    g_attn = max(1, min(16, g_tok, _TILE_BYTES // max(per_g_attn, 1)))
    # the MLP half budgets a little higher: its weights leave more VMEM
    # free than the attention half's scores workspace (g=2 at ViT-B shapes
    # is the measured winner, docs/DESIGN.md)
    g_mlp = max(1, min(16, g_tok, (7 * 1024 * 1024) // max(per_g_mlp, 1)))
    return g_attn, g_mlp


def _block_flavor(x, p, interpret=False):
    """Static trace-time routing facts shared by forward and backward.

    `unfused` also trips for widths that aren't a multiple of the 128-lane
    register: Mosaic's layout inference rejects the [G, L, D] -> [G*L, D]
    flatten for sub-lane D (observed: TINY's D=64 at batch 16, "unsupported
    shape cast"). Every real CLIP tower (512/768/1024 wide, 2048-4096
    hidden) is lane-aligned; only debug towers fall back to XLA. Interpret
    mode has no Mosaic, so tests keep exercising the kernels at any width."""
    itemsize = x.dtype.itemsize
    d = x.shape[-1]
    unfused = (
        p["w_qkv"].dtype == jnp.int8
        or x.dtype == jnp.float16
        or (
            not interpret
            and (d % 128 != 0 or p["c_fc_w"].shape[-1] % 128 != 0)
        )
    )
    attn_w = (p["w_qkv"].size + p["w_out"].size) * itemsize
    mlp_w = (p["c_fc_w"].size + p["c_proj_w"].size) * itemsize
    return unfused, attn_w, mlp_w


def _fused_block_fwd_impl(x, p, n_head, mask, interpret=False, want_y=False):
    from ovmr_tpu.ops.layers import layer_norm, mlp_block, multi_head_attention

    itemsize = x.dtype.itemsize
    l, d = x.shape[-2], x.shape[-1]
    hidden = p["c_fc_w"].shape[-1]
    # int8 weights (dynamic-quant serving) and fp16 activations (the
    # reference-numerics TPU.DTYPE=float16 path; Mosaic's fp16 lowering is
    # not a supported TPU compute type) use the XLA block
    unfused, attn_w, mlp_w = _block_flavor(x, p, interpret)
    g_attn, g_mlp = _g_limits(l, d, hidden, itemsize)

    def ret(z, y):
        return (z, y) if want_y else z

    attn_fused = not unfused and attn_w <= _ATTN_W_CUTOFF
    if attn_fused:
        if attn_w > _ATTN_W_SMALL:
            # big-attention towers (ViT-L 8.4 MB): g=2 measured faster
            # than the round-2 forced g=1 (tools/ab_vitl2.py); the padded
            # x-tile cap in _g_limits already clamps long sequences
            # (@336's 577 tokens) back to g=1
            g_attn = min(g_attn, 2)
        y = fused_attn_half(
            x, p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"],
            p["ln_1_scale"], p["ln_1_bias"],
            mask=mask, n_head=n_head, g_limit=g_attn, interpret=interpret,
        )
    else:
        y = x + multi_head_attention(
            layer_norm(x, p["ln_1_scale"], p["ln_1_bias"]), p, n_head, mask
        )
    if not unfused and mlp_w <= _MLP_W_CUTOFF:
        return ret(
            fused_mlp_half(
                y, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
                p["ln_2_scale"], p["ln_2_bias"], g_limit=g_mlp,
                interpret=interpret,
            ),
            y,
        )
    g_big = min(2, _tile_token_limit(l, d, itemsize))
    if attn_fused and mlp_w <= _MLP_W_RESIDENT_FWD and g_big >= 2:
        # big-MLP towers at 2-row tiles (ViT-L/14@224, 16.8 MB): keep the
        # weights resident anyway — measured 142.3 ms vs 150-162 for every
        # chunked variant at batch 128 (tools/ab_vitl2.py). Long sequences
        # whose padded x-tile caps g at 1 (@336's 577 tokens) measured
        # FASTER chunked (125 vs 131 ms resident, tools/ab_vitl336.py), so
        # they keep the chunked route below.
        return ret(
            fused_mlp_half(
                y, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
                p["ln_2_scale"], p["ln_2_bias"], g_limit=g_big,
                interpret=interpret,
            ),
            y,
        )
    if attn_fused:
        # beyond the residency tier: stream the weights in hidden-dim
        # chunks; the hidden activation still never leaves VMEM
        chunks = max(2, -(-mlp_w // (8 * 1024 * 1024)))
        return ret(
            fused_mlp_half_chunked(
                y, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
                p["ln_2_scale"], p["ln_2_bias"], g_limit=1,
                chunks=chunks, interpret=interpret,
            ),
            y,
        )
    return ret(
        y + mlp_block(layer_norm(y, p["ln_2_scale"], p["ln_2_bias"]), p), y
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def _fused_block(x, p, n_head, mask, interpret=False):
    return _fused_block_fwd_impl(x, p, n_head, mask, interpret=interpret)


def _fused_block_fwd(x, p, n_head, mask, interpret=False):
    z, y = _fused_block_fwd_impl(
        x, p, n_head, mask, interpret=interpret, want_y=True
    )
    return z, (x, y, p, mask)


def _bwd_g_limits(l: int, d: int, hidden: int, itemsize: int):
    """Batch-tile limits for the dx kernels (more live fp32 temporaries
    than forward: the MLP keeps 4 [L, hidden] fp32 arrays, the attention
    half ~4 [L, L] fp32 per-head arrays + dqkv)."""
    g_tok = _tile_token_limit(l, d, itemsize)
    per_g_attn = l * d * itemsize * 10 + 16 * l * l + 6 * l * 3 * d
    per_g_mlp = 16 * l * hidden + 6 * l * d * itemsize
    g_attn = max(1, min(16, g_tok, (5 * 1024 * 1024) // max(per_g_attn, 1)))
    g_mlp = max(1, min(16, g_tok, (5 * 1024 * 1024) // max(per_g_mlp, 1)))
    return g_attn, g_mlp


def _fused_block_bwd(n_head, interpret, res, g):
    from ovmr_tpu.ops.layers import residual_attention_block

    x, y, p, mask = res
    unfused, attn_w, mlp_w = _block_flavor(x, p, interpret)
    pallas_dx = (
        not unfused
        and attn_w <= _ATTN_W_CUTOFF
        and mlp_w <= _MLP_W_CUTOFF
    )
    if pallas_dx:
        # dx rides Pallas (in-kernel recompute, intermediates stay in VMEM).
        # Only the TEXT tower is ever differentiated in OVMR (towers are
        # frozen; grads flow through into the prompt embeddings), and every
        # CLIP text tower's weights fit the forward residency cutoffs.
        from ovmr_tpu.ops.block_fused_bwd import (
            attn_half_bwd_dx,
            mlp_half_bwd_dx,
        )

        l, d = x.shape[-2], x.shape[-1]
        g_attn, g_mlp = _bwd_g_limits(
            l, d, p["c_fc_w"].shape[-1], x.dtype.itemsize
        )
        dy = mlp_half_bwd_dx(
            y, g, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"],
            p["ln_2_scale"], p["ln_2_bias"], g_limit=g_mlp,
            interpret=interpret,
        )
        dx = attn_half_bwd_dx(
            x, dy, p["w_qkv"], p["b_qkv"], p["w_out"],
            p["ln_1_scale"], p["ln_1_bias"], mask=mask, n_head=n_head,
            g_limit=g_attn, interpret=interpret,
        )
        # Parameter cotangents via the XLA chain: DCE'd whenever the caller
        # discards them (every shipped trainer — towers frozen), correct on
        # the day someone fine-tunes tower weights.
        _, vjp_p = jax.vjp(
            lambda p_: residual_attention_block(x, p_, n_head, mask), p
        )
        (dp,) = vjp_p(g)
    else:
        _, vjp = jax.vjp(
            lambda x_, p_: residual_attention_block(x_, p_, n_head, mask),
            x, p,
        )
        dx, dp = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dx, dp, dmask


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_residual_block(x, p, n_head, mask=None, interpret=False):
    """Drop-in replacement for ops.layers.residual_attention_block running
    both fused Pallas halves. Differentiable (XLA-math VJP)."""
    return _fused_block(x, p, n_head, mask, interpret)
