import sys, time, glob
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.block_fused import fused_residual_block
from ovmr_tpu.ops.layers import l2_normalize

cfg = jclip.VIT_B16
params = jclip.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
images = jax.random.normal(jax.random.PRNGKey(1), (256, 3, 224, 224), jnp.bfloat16)
cls = l2_normalize(jax.random.normal(jax.random.PRNGKey(2), (1000, cfg.embed_dim), jnp.float32))

@jax.jit
def run(p, x, c):
    f = l2_normalize(jclip.encode_image(p, cfg, x, block_fn=fused_residual_block)).astype(jnp.float32)
    return jnp.sum(jnp.argmax(100.0 * f @ c.T, -1))

print("warm", float(run(params, images, cls)))
try:
    with jax.profiler.trace("/tmp/prof_out"):
        for _ in range(4):
            _ = float(run(params, images, cls))
    files = glob.glob("/tmp/prof_out/**/*", recursive=True)
    print("trace files:", len(files))
    for f in files[:10]: print(" ", f)
except Exception as e:
    print("profiler failed:", type(e).__name__, e)
