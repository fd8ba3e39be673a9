"""ViT-L/14@336 (577 tokens, batch 32) tile A/B: shipped chunked-MLP
recipe vs fully-resident 16.8 MB MLP. Companion to tools/ab_vitl2.py;
run from the repo root on chip. Also reports feature cosine vs the XLA
path for every variant (argmax sums on random classifiers flip on ties,
so cosine is the agreement metric)."""

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
    fused_attn_half,
    fused_mlp_half,
    fused_mlp_half_chunked,
    fused_residual_block,
)
from ovmr_tpu.ops.layers import l2_normalize

cfg = jclip.VIT_L14_336
key = jax.random.PRNGKey(0)
batch = 32
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
images = jax.random.normal(key, (batch, 3, 336, 336), jnp.bfloat16)


def make_block(g_attn, mlp):
    def block(x, p, n_head, mask):
        y = fused_attn_half(
            x, p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"],
            p["ln_1_scale"], p["ln_1_bias"],
            mask=mask, n_head=n_head, g_limit=g_attn,
        )
        return mlp(y, p)

    return block


def mlp_chunked(y, p, g, chunks):
    return fused_mlp_half_chunked(
        y, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
        p["ln_2_scale"], p["ln_2_bias"], g_limit=g, chunks=chunks,
    )


def mlp_resident(y, p, g):
    return fused_mlp_half(
        y, p["c_fc_w"], p["c_fc_b"], p["c_proj_w"], p["c_proj_b"],
        p["ln_2_scale"], p["ln_2_bias"], g_limit=g,
    )


def make_variant(block_fn):
    @jax.jit
    def run(p, x):
        return l2_normalize(
            jclip.encode_image(p, cfg, x, block_fn=block_fn)
        ).astype(jnp.float32)

    return run


VARIANTS = {
    "xla": make_variant(None),
    "shipped(a1,c1x3)": make_variant(fused_residual_block),
    "a1,resident1": make_variant(
        make_block(1, lambda y, p: mlp_resident(y, p, 1))
    ),
    "a1,c1x2": make_variant(
        make_block(1, lambda y, p: mlp_chunked(y, p, 1, 2))
    ),
    "a2,resident2": make_variant(
        make_block(2, lambda y, p: mlp_resident(y, p, 2))
    ),
}

ref = None
for name, fn in list(VARIANTS.items()):
    try:
        t0 = time.perf_counter()
        feats = np.asarray(fn(params, images))
        dt = time.perf_counter() - t0
        if ref is None:
            ref = feats
            print(f"{name}: compile+first {dt:.1f}s (reference)")
        else:
            cos = float(np.mean(np.sum(feats * ref, -1)))
            print(f"{name}: compile+first {dt:.1f}s cos_vs_xla={cos:.6f}")
    except Exception as e:  # noqa: BLE001 — VMEM OOM is an expected outcome
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}")
        del VARIANTS[name]

best = {name: float("inf") for name in VARIANTS}
for rnd in range(3):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = [fn(params, images) for _ in range(6)]
        _ = [np.asarray(o[0, 0]) for o in out]
        ms = (time.perf_counter() - t0) / 6 * 1e3
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms")

print("\n=== best (ms/batch, img/s) ===")
for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"{name}: {ms:.1f} ms  {batch/(ms/1e3):.0f} img/s")
