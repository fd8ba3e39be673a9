"""ViT-L/14 tile-shape exploration (interleaved A/B, batch 128, bf16).

The shipped ViT-L recipe is fused attention g=1 + hidden-chunked MLP
g=1/chunks=3 (154.4 ms/batch-128 — docs/DESIGN.md), at ~75% of the
chip's sustained-matmul ceiling (20.7 TFLOP / 178.8 TF/s = 115.7 ms
floor). The forced g=1 comes from the >6 MB attention-weight rule, but
the padded x-tile at g=2 (2 x 264 x 1024 x 2 B = 1.08 MB) is under the
proven scoped-VMEM cap (1.311 MB), so larger tiles may compile and
pipeline better. This harness A/Bs tile/chunk combinations; run from the
repo root on chip.
"""

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

cfg = jclip.VIT_L14
key = jax.random.PRNGKey(0)
batch = 128
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
images = jax.random.normal(key, (batch, 3, 224, 224), jnp.bfloat16)
classifier = l2_normalize(
    jax.random.normal(key, (1000, cfg.embed_dim), jnp.float32)
)


def attn(x, p, n_head, mask, g):
    return fused_attn_half(
        x, p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"],
        p["ln_1_scale"], p["ln_1_bias"], mask=mask, n_head=n_head, g_limit=g,
    )


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


def make_block(g_attn, mlp):
    def block(x, p, n_head, mask):
        return mlp(attn(x, p, n_head, mask, g_attn), p)

    return block


def make_variant(block_fn):
    @jax.jit
    def run(p, x, cls):
        feats = l2_normalize(
            jclip.encode_image(p, cfg, x, block_fn=block_fn)
        ).astype(jnp.float32)
        return jnp.sum(jnp.argmax(100.0 * feats @ cls.T, -1))

    return run


VARIANTS = {
    "shipped(a1,c1x3)": make_variant(fused_residual_block),
    "a2,c1x3": make_variant(
        make_block(2, lambda y, p: mlp_chunked(y, p, 1, 3))
    ),
    "a1,c2x3": make_variant(
        make_block(1, lambda y, p: mlp_chunked(y, p, 2, 3))
    ),
    "a2,c2x3": make_variant(
        make_block(2, lambda y, p: mlp_chunked(y, p, 2, 3))
    ),
    "a2,c2x2": make_variant(
        make_block(2, lambda y, p: mlp_chunked(y, p, 2, 2))
    ),
    "a1,c1x2": make_variant(
        make_block(1, lambda y, p: mlp_chunked(y, p, 1, 2))
    ),
    "a2,resident2": make_variant(
        make_block(2, lambda y, p: mlp_resident(y, p, 2))
    ),
    "a1,resident1": make_variant(
        make_block(1, lambda y, p: mlp_resident(y, p, 1))
    ),
}

ref = None
for name, fn in list(VARIANTS.items()):
    try:
        t0 = time.perf_counter()
        val = float(fn(params, images, classifier))
        print(
            f"{name}: compile+first {time.perf_counter()-t0:.1f}s value={val}"
        )
        if ref is None:
            ref = val
        elif abs(val - ref) > batch * 0.05:
            print(f"  WARNING: {name} disagrees: {val} vs {ref}")
    except Exception as e:  # noqa: BLE001 — VMEM OOM is an expected outcome
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}")
        del VARIANTS[name]

best = {name: float("inf") for name in VARIANTS}
for rnd in range(3):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = [fn(params, images, classifier) for _ in range(6)]
        _ = np.asarray(jnp.stack(out))
        ms = (time.perf_counter() - t0) / 6 * 1e3
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms")

print("\n=== best (ms/batch, img/s) ===")
for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
    print(f"{name}: {ms:.1f} ms  {batch/(ms/1e3):.0f} img/s")
