"""Pallas backward (input-cotangent) kernels for the fused residual block.

Scope: **dx only**. Every OVMR trainer freezes the CLIP towers (reference
``trainers/mm_classifier_one_prompt.py:129-141`` turns off requires_grad on
everything but the aggregator; ``trainers/coop_mm_classifier.py`` trains only
the ctx vectors) — gradients flow *through* the text tower into the prompt
embeddings but the tower weights' cotangents are discarded. JAX still asks
the block's custom VJP for parameter cotangents, so those are produced by a
plain XLA chain in :mod:`ovmr_tpu.ops.block_fused` that XLA dead-code
eliminates when (as in every shipped trainer) nothing consumes them. Folding
the weight gradients into these kernels would defeat that DCE *and* need
~19 MB of fp32 accumulators resident in a ~16 MB VMEM.

Each kernel recomputes its half's forward intermediates in VMEM
(flash-attention-style: the [L, L] score/prob matrices, the 4x-width MLP
hidden, and the LayerNorm statistics never touch HBM) and emits the input
cotangent with the same numerics contract as the forward kernels: bf16 MXU
matmuls with fp32 accumulation, fp32 softmax/LayerNorm math.

The attention half consumes the block input x; the MLP half consumes the
attention half's output y (saved as a forward residual — it is already
materialized in HBM between the two forward pallas_calls).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ovmr_tpu.ops.block_fused import _pick_tile, _resident, _row


def _ln_pieces(x, scale_ref, eps=1e-5):
    """fp32 (normed, rsqrt, gamma) of LayerNorm — the recompute both the
    xln rebuild and the LN input-cotangent need."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    return centered * r, r, scale_ref[0].astype(jnp.float32)


def _ln_bwd_dx(dxln, normed, r, gamma):
    """Input cotangent of xln = normed*gamma + beta (fp32 math)."""
    dnormed = dxln * gamma
    m1 = jnp.mean(dnormed, axis=-1, keepdims=True)
    m2 = jnp.mean(dnormed * normed, axis=-1, keepdims=True)
    return r * (dnormed - m1 - normed * m2)


def _mlp_bwd_dx_kernel(
    y_ref, g_ref, wfc_ref, bfc_ref, wproj_ref, lns_ref, lnb_ref, o_ref
):
    y = y_ref[...]  # [G, L, D]
    gy = g_ref[...]
    g, l, d = y.shape
    dtype = y.dtype

    normed, r, gamma = _ln_pieces(y, lns_ref)
    xln = (normed * gamma + lnb_ref[0].astype(jnp.float32)).astype(dtype)
    h_pre = jax.lax.dot_general(
        xln.reshape(g * l, d),
        wfc_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[0].astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * h_pre)

    g2 = gy.reshape(g * l, d).astype(dtype)
    dh = jax.lax.dot_general(
        g2, wproj_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [GL, H] fp32
    # QuickGELU': s + 1.702*h*s*(1-s)
    dh_pre = dh * (s + 1.702 * h_pre * s * (1.0 - s))
    dxln = jax.lax.dot_general(
        dh_pre.astype(dtype), wfc_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, l, d)
    dx_ln = _ln_bwd_dx(dxln, normed, r, gamma)
    o_ref[...] = gy + dx_ln.astype(dtype)


@functools.partial(jax.jit, static_argnames=("g_limit", "interpret"))
def mlp_half_bwd_dx(
    y, g, c_fc_w, c_fc_b, c_proj_w, ln_s, ln_b,
    g_limit: int = 2,
    interpret: bool = False,
):
    """d/dy of ``y + c_proj(QuickGELU(c_fc(LN2(y))))`` applied to cotangent g."""
    b, l, d = y.shape
    hidden = c_fc_w.shape[-1]
    gt = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((gt, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=6 * b * l * d * hidden,
        bytes_accessed=3 * y.size * y.dtype.itemsize
        + (c_fc_w.size + c_proj_w.size) * c_fc_w.dtype.itemsize,
        transcendentals=b * l * hidden,
    )
    return pl.pallas_call(
        _mlp_bwd_dx_kernel,
        grid=(b // gt,),
        in_specs=[
            tile,
            tile,
            _resident(c_fc_w.shape),
            _resident((1, hidden)),
            _resident(c_proj_w.shape),
            _resident((1, d)),
            _resident((1, d)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), y.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(y, g, c_fc_w, _row(c_fc_b), c_proj_w, _row(ln_s), _row(ln_b))


def _attn_bwd_dx_kernel(
    x_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, lns_ref, lnb_ref, o_ref,
    *, n_head: int, mask_ref=None,
):
    x = x_ref[...]  # [G, L, D]
    gy = g_ref[...]
    g, l, d = x.shape
    dtype = x.dtype
    dh = d // n_head
    scale = dh ** -0.5

    normed, r, gamma = _ln_pieces(x, lns_ref)
    xln = (normed * gamma + lnb_ref[0].astype(jnp.float32)).astype(dtype)
    qkv = jax.lax.dot_general(
        xln.reshape(g * l, d),
        wqkv_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dtype)
    qkv = qkv.reshape(g, l, 3 * d)

    dattn = jax.lax.dot_general(
        gy.reshape(g * l, d).astype(dtype),
        wout_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(g, l, d)

    dq_heads, dk_heads, dv_heads = [], [], []
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
        )
        if mask_ref is not None:
            scores = scores + mask_ref[...].astype(jnp.float32)[None]
        probs = jax.nn.softmax(scores, axis=-1)  # [G, L, L] fp32

        doh = dattn[:, :, h * dh : (h + 1) * dh]
        dp = jax.lax.dot_general(
            doh, vh,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, L, L]
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        ds = (ds * scale).astype(dtype)
        dq_heads.append(
            jax.lax.dot_general(
                ds, kh,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
        # dk[j] = sum_i ds[i, j] * q[i]
        dk_heads.append(
            jax.lax.dot_general(
                ds, qh,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
        # dv[j] = sum_i probs[i, j] * doh[i]
        dv_heads.append(
            jax.lax.dot_general(
                probs.astype(dtype), doh,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    dqkv = jnp.concatenate(
        dq_heads + dk_heads + dv_heads, axis=-1
    )  # [G, L, 3D] — q heads | k heads | v heads, the forward packing

    dxln = jax.lax.dot_general(
        dqkv.reshape(g * l, 3 * d),
        wqkv_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, l, d)
    dx_ln = _ln_bwd_dx(dxln, normed, r, gamma)
    o_ref[...] = gy + dx_ln.astype(dtype)


def _masked_attn_bwd_dx_kernel(
    mask_ref, x_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, lns_ref, lnb_ref,
    o_ref, *, n_head: int,
):
    _attn_bwd_dx_kernel(
        x_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, lns_ref, lnb_ref, o_ref,
        n_head=n_head, mask_ref=mask_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("n_head", "g_limit", "interpret")
)
def attn_half_bwd_dx(
    x, g, w_qkv, b_qkv, w_out, ln_s, ln_b,
    mask: Optional[jax.Array] = None,
    n_head: int = 12,
    g_limit: int = 2,
    interpret: bool = False,
):
    """d/dx of ``x + proj(attention(LN1(x)))`` applied to cotangent g."""
    b, l, d = x.shape
    gt = _pick_tile(b, g_limit)
    tile = pl.BlockSpec((gt, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * (2 * b * l * d * (3 * d + d)) + 10 * b * l * l * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * x.size * x.dtype.itemsize
        + (w_qkv.size + w_out.size) * w_qkv.dtype.itemsize,
        transcendentals=b * l * l,
    )
    args = [
        x, g, w_qkv, _row(b_qkv), w_out, _row(ln_s), _row(ln_b)
    ]
    in_specs = [
        tile,
        tile,
        _resident(w_qkv.shape),
        _resident((1, b_qkv.shape[0])),
        _resident(w_out.shape),
        _resident((1, ln_s.shape[0])),
        _resident((1, ln_b.shape[0])),
    ]
    if mask is None:
        kernel = functools.partial(_attn_bwd_dx_kernel, n_head=n_head)
    else:
        kernel = functools.partial(_masked_attn_bwd_dx_kernel, n_head=n_head)
        args = [mask.astype(jnp.float32)] + args
        in_specs = [_resident(mask.shape)] + in_specs
    return pl.pallas_call(
        kernel,
        grid=(b // gt,),
        in_specs=in_specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
