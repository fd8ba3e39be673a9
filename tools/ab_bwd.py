"""Controlled interleaved A/B: text-tower forward+backward (the stage-2
CoOp / stage-1 classifier-head training path — gradients flow THROUGH the
frozen tower into the prompt embeddings, reference
``trainers/coop_mm_classifier.py:317-337``).

Variants:
  xla        — plain XLA block fwd + XLA bwd
  fused_old  — Pallas fwd, bwd = full XLA recompute VJP (round-2 shipping
               behavior before the dx kernels)
  fused      — Pallas fwd + Pallas dx bwd (ops/block_fused_bwd)

Usage: python tools/ab_bwd.py [n_cls] [model]   (default 1000 ViT-B/16;
batch = 3*n_cls sequences of 77 tokens, the 3-prompt CoOp loss shape;
model: b16 | l14)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.block_fused import (
    _fused_block_fwd_impl,
    fused_residual_block,
)
from ovmr_tpu.ops.layers import (
    l2_normalize,
    residual_attention_block,
    residual_block_remat,
)

cfg = (
    jclip.VIT_L14
    if len(sys.argv) > 2 and sys.argv[2] == "l14"
    else jclip.VIT_B16
)
key = jax.random.PRNGKey(0)
n_cls = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
batch = 3 * n_cls  # mm + v + t prompt variants
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)

embeds = 0.02 * jax.random.normal(
    jax.random.PRNGKey(1), (batch, 77, cfg.transformer_width), jnp.bfloat16
)
eot = jnp.full((batch,), 9, jnp.int32)
targets = l2_normalize(
    jax.random.normal(jax.random.PRNGKey(2), (batch, cfg.embed_dim), jnp.float32)
)


# round-2 shipping behavior: Pallas fwd, full-XLA-recompute bwd
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _old_fused_block(x, p, n_head, mask):
    return _fused_block_fwd_impl(x, p, n_head, mask)


def _old_fwd(x, p, n_head, mask):
    return _old_fused_block(x, p, n_head, mask), (x, p, mask)


def _old_bwd(n_head, res, g):
    x, p, mask = res
    _, vjp = jax.vjp(
        lambda x_, p_: residual_attention_block(x_, p_, n_head, mask), x, p
    )
    dx, dp = vjp(g)
    return dx, dp, None if mask is None else jnp.zeros_like(mask)


_old_fused_block.defvjp(_old_fwd, _old_bwd)


def old_fused(x, p, n_head, mask=None, interpret=False):
    return _old_fused_block(x, p, n_head, mask)


def make_variant(block_fn):
    @jax.jit
    def run(p, emb):
        def loss_fn(e):
            f = l2_normalize(
                jclip.encode_text_embeds(p, cfg, e, eot, block_fn=block_fn)
            ).astype(jnp.float32)
            return -jnp.sum(f * targets)

        loss, grad = jax.value_and_grad(loss_fn)(emb)
        return loss + jnp.sum(grad.astype(jnp.float32) ** 2)

    return run


def xla_remat_block(x, p, n_head, mask=None, interpret=False):
    return residual_block_remat(x, p, n_head, mask)


VARIANTS = {
    "xla": make_variant(None),
    "xla_remat": make_variant(xla_remat_block),
    "fused_old": make_variant(old_fused),
    "fused": make_variant(fused_residual_block),
}


def time_variant(fn, iters=8):
    t0 = time.perf_counter()
    out = [fn(params, embeds) for _ in range(iters)]
    _ = np.asarray(jnp.stack(out))
    return (time.perf_counter() - t0) / iters * 1e3


ref = None
alive = {}
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    try:
        val = float(fn(params, embeds))
    except Exception as e:  # plain XLA OOMs above ~150 classes: it saves
        # every per-layer intermediate of the 12-block scan for backward
        # (86 GB at 1000 classes); the fused block's VJP saves only (x, y)
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAILED after {time.perf_counter()-t0:.1f}s — {msg}")
        continue
    alive[name] = fn
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s value={val:.4f}")
    if ref is None:
        ref = val
    elif not np.isclose(val, ref, rtol=0.02):
        print(f"  WARNING: {name} loss+gradnorm {val} vs ref {ref}")

best = {name: float("inf") for name in alive}
for rnd in range(3):
    for name, fn in alive.items():
        ms = time_variant(fn)
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms")

print(f"\n=== best ms per fwd+bwd of {batch} x 77-token prompts ===")
for name, ms in best.items():
    print(f"{name}: {ms:.1f} ms")
