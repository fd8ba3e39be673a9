"""Interleaved A/B: classifier-generation chunk size at 8192-class scale.
Replicates MM_CLS_OP.generate_classifiers' per-chunk program structure."""
import sys, time, functools
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from ovmr_tpu.models import clip as jclip, ovmr
from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.ops.block_fused import fused_residual_block

cfg = jclip.VIT_B16
key = jax.random.PRNGKey(0)
dtype = jnp.bfloat16
clip_p = jclip.init_params(key, cfg, dtype=dtype)
agg_p = jax.tree_util.tree_map(lambda a: a.astype(dtype), init_aggregator(key, width=cfg.embed_dim, layers=4, n_ctx=2))
N, shots, dim = 8192, 16, cfg.embed_dim
rng = np.random.default_rng(0)
feats_np = rng.standard_normal((N, shots, dim), np.float32)
feats_np /= np.linalg.norm(feats_np, axis=-1, keepdims=True)
ptok_np = rng.integers(350, 4000, size=(N, 77)).astype(np.int32)
ptok_np[:, 0] = 49406; ptok_np[:, 6] = 49407; ptok_np[:, 7:] = 0
eot_np = np.full(N, 6, np.int32)
vis_tokens = jnp.asarray(np.array([49406, 320, 269, 49407] + [0]*73, np.int32))
block_fn = fused_residual_block if jax.default_backend() == "tpu" else None

@jax.jit
def jit_text(clip_p, ptok):
    return ovmr.text_classifier(clip_p, cfg, ptok, block_fn=block_fn)

@jax.jit
def jit_heads(clip_p, agg_p, feats, ptok, eot):
    n = feats.shape[0]
    prompt_embeds = jclip.embed_tokens(clip_p, ptok).astype(feats.dtype)
    vis_embeds = jnp.broadcast_to(
        jclip.embed_tokens(clip_p, vis_tokens[None]).astype(feats.dtype),
        (n, vis_tokens.shape[0], feats.shape[-1]))
    return ovmr.classifier_heads(clip_p, cfg, agg_p, feats, prompt_embeds,
                                 vis_embeds, eot, block_fn=block_fn)

def run(chunk):
    mm_parts, t_parts = [], []
    for s in range(0, N, chunk):
        sl = slice(s, s + chunk)
        pt = jnp.asarray(ptok_np[sl])
        t_parts.append(jit_text(clip_p, pt))
        mm_c, v_c, vt_c = jit_heads(clip_p, agg_p, jnp.asarray(feats_np[sl], dtype), pt, jnp.asarray(eot_np[sl]))
        mm_parts.append(mm_c)
    mm = np.concatenate([np.asarray(p, np.float32) for p in mm_parts])
    t = np.concatenate([np.asarray(p, np.float32) for p in t_parts])
    return float(mm.sum() + t.sum())

CHUNKS = [1024, 2048, 4096]
for c in CHUNKS:
    t0 = time.perf_counter(); v = run(c)
    print(f"chunk {c}: compile+run {time.perf_counter()-t0:.1f}s  check={v:.2f}")
for rnd in range(3):
    for c in CHUNKS:
        t0 = time.perf_counter(); run(c)
        print(f"round {rnd} chunk {c}: {time.perf_counter()-t0:.2f}s for {N} classes")
