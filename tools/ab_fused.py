"""Controlled interleaved A/B: XLA block vs fused Pallas block, full
ViT-B/16 encode, batch 256, bf16, one process (the only timing methodology
that survives this chip's relay noise — docs/DESIGN.md)."""

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
from ovmr_tpu.ops.block_fused import fused_residual_block
from ovmr_tpu.ops.layers import l2_normalize

cfg = jclip.VIT_B16
key = jax.random.PRNGKey(0)
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
images = jax.random.normal(key, (batch, 3, 224, 224), jnp.bfloat16)
classifier = l2_normalize(
    jax.random.normal(key, (1000, cfg.embed_dim), jnp.float32)
)


def make_variant(block_fn):
    @jax.jit
    def run(p, x, cls):
        feats = l2_normalize(
            jclip.encode_image(p, cfg, x, block_fn=block_fn)
        ).astype(jnp.float32)
        return jnp.sum(jnp.argmax(100.0 * feats @ cls.T, -1))

    return run


VARIANTS = {
    "xla": make_variant(None),
    "fused_g4": make_variant(functools.partial(fused_residual_block)),
}


def time_variant(fn, iters=8):
    t0 = time.perf_counter()
    out = [fn(params, images, classifier) for _ in range(iters)]
    _ = np.asarray(jnp.stack(out))
    return (time.perf_counter() - t0) / iters * 1e3


# compile + correctness cross-check
ref = None
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    val = float(fn(params, images, classifier))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s value={val}")
    if ref is None:
        ref = val
    elif abs(val - ref) > batch * 0.05:
        print(f"  WARNING: {name} classify sum {val} vs xla {ref}")

best = {name: float("inf") for name in VARIANTS}
for rnd in range(3):
    for name, fn in VARIANTS.items():
        ms = time_variant(fn)
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms")

print("\n=== best (ms/batch, img/s) ===")
for name, ms in best.items():
    print(f"{name}: {ms:.1f} ms  {batch/(ms/1e3):.0f} img/s")
