"""Pallas fused multi-head attention for TPU.

CLIP's sequences are short (77 text / 197 vision tokens), so the entire
per-(batch, head) attention problem — Q, K, V, the L x L score matrix and the
output — fits comfortably in VMEM. One kernel fuses QK^T, masking, the fp32
softmax and PV, eliminating the HBM round-trips XLA would need between those
ops for large batches.

Contract matches :func:`ovmr_tpu.ops.layers.attention_xla` (the XLA fallback
used on CPU and in tests): inputs ``[B, H, L, Dh]``, optional additive mask
``[L, L]``, fp32 score/softmax accumulation, output in the input dtype.

Replaces the torch ``nn.MultiheadAttention`` kernels that back every
encoder in the reference (``clip/model.py:167-217``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # refs are [1, L, Dh] blocks for one (b*h) program
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [L, L]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_kernel_masked(mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + mask_ref[:, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention over [B, H, L, Dh]; `mask` is additive [L, L] or None."""
    b, h, l, d = q.shape
    bh = b * h
    qf = q.reshape(bh, l, d)
    kf = k.reshape(bh, l, d)
    vf = v.reshape(bh, l, d)
    scale = d ** -0.5

    data_spec = pl.BlockSpec(
        (1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((bh, l, d), q.dtype)
    cost = pl.CostEstimate(
        flops=2 * bh * (l * l * d * 2),
        bytes_accessed=4 * bh * l * d * q.dtype.itemsize + bh * l * l * 4,
        transcendentals=bh * l * l,
    )

    if mask is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=(bh,),
            in_specs=[data_spec] * 3,
            out_specs=data_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(qf, kf, vf)
    else:
        mask_spec = pl.BlockSpec((l, l), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel_masked, scale=scale),
            grid=(bh,),
            in_specs=[mask_spec] + [data_spec] * 3,
            out_specs=data_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(mask.astype(jnp.float32), qf, kf, vf)

    return out.reshape(b, h, l, d)


# --------------------------------------------------------------------------
# differentiable wrappers: Pallas forward, exact XLA-math backward
# (Pallas kernels carry no autodiff rule; the text tower is differentiated
# through during training, so the kernel must expose a VJP)
# --------------------------------------------------------------------------


@jax.custom_vjp
def pallas_attention(q, k, v):
    return fused_attention(q, k, v, None)


def _pa_fwd(q, k, v):
    return fused_attention(q, k, v, None), (q, k, v)


def _pa_bwd(res, g):
    from ovmr_tpu.ops.layers import attention_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, None), q, k, v)
    return vjp(g)


pallas_attention.defvjp(_pa_fwd, _pa_bwd)


@jax.custom_vjp
def pallas_attention_masked(q, k, v, mask):
    return fused_attention(q, k, v, mask)


def _pam_fwd(q, k, v, mask):
    return fused_attention(q, k, v, mask), (q, k, v, mask)


def _pam_bwd(res, g):
    from ovmr_tpu.ops.layers import attention_xla

    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_xla(q_, k_, v_, mask), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


pallas_attention_masked.defvjp(_pam_fwd, _pam_bwd)


def make_attn_fn(use_pallas: Optional[bool] = None):
    """Pick the attention implementation.

    use_pallas=None auto-selects: the Pallas kernel on TPU backends, the XLA
    path elsewhere (CPU tests, interpret-free). The Pallas path is fully
    differentiable (custom VJP recomputes the backward with XLA math).
    """
    from ovmr_tpu.ops.layers import attention_xla

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return attention_xla

    def attn(q, k, v, mask=None):
        if mask is None:
            return pallas_attention(q, k, v)
        return pallas_attention_masked(q, k, v, mask)

    return attn
