"""Interleaved A/B for ViT-B/32 (L=50) with the padded-token tile cap."""
import functools, os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.block_fused import fused_residual_block, _g_limits
from ovmr_tpu.ops.layers import l2_normalize

cfg = jclip.VIT_B32
print("g_limits (l=50,d=768,h=3072,bf16):", _g_limits(50, 768, 3072, 2))
key = jax.random.PRNGKey(0)
batch = 256
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
images = jax.random.normal(key, (batch, 3, 224, 224), jnp.bfloat16)
classifier = l2_normalize(jax.random.normal(key, (1000, cfg.embed_dim), jnp.float32))

def make_variant(block_fn):
    @jax.jit
    def run(p, x, cls):
        feats = l2_normalize(jclip.encode_image(p, cfg, x, block_fn=block_fn)).astype(jnp.float32)
        return jnp.sum(jnp.argmax(100.0 * feats @ cls.T, -1))
    return run

VARIANTS = {"xla": make_variant(None), "fused": make_variant(fused_residual_block)}
ref = None
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    val = float(fn(params, images, classifier))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s val={val}")
    if ref is None: ref = val
    elif val != ref:
        # bf16 kernel-order differences can flip near-tie argmaxes; warn,
        # don't abort the timing rounds
        print(f"  note: argmax-sum differs from {ref} (near-tie flips)")

def time_variant(fn, iters=8):
    t0 = time.perf_counter()
    out = [fn(params, images, classifier) for _ in range(iters)]
    _ = np.asarray(jnp.stack(out))
    return (time.perf_counter() - t0) / iters * 1e3

for rnd in range(3):
    for name, fn in VARIANTS.items():
        print(f"round {rnd} {name}: {time_variant(fn):.1f} ms")
