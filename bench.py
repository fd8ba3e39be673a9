"""Benchmark: CLIP ViT-B/16 encode + classify throughput on one TPU chip.

The reference publishes no throughput numbers (BASELINE.json.published = {}),
so the baseline stand-in is this framework's own NAIVE path — fp32 params
with plain-XLA attention, the direct translation of the torch module — and
``vs_baseline`` is the speedup of the optimized path (bf16 + Pallas fused
attention) over it on the same chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": "img/s/chip", "vs_baseline": x}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.attention import make_attn_fn
    from ovmr_tpu.ops.layers import attention_xla, l2_normalize

    cfg = jclip.VIT_B16
    key = jax.random.PRNGKey(0)
    params32 = jclip.init_params(key, cfg, dtype=jnp.float32)
    params16 = jclip.cast_params(params32, jnp.bfloat16)

    n_classes = 1000
    classifier = l2_normalize(
        jax.random.normal(key, (n_classes, cfg.embed_dim), jnp.float32)
    )

    batch = 256
    images32 = jax.random.normal(key, (batch, 3, 224, 224), jnp.float32)
    images16 = images32.astype(jnp.bfloat16)

    on_tpu = jax.default_backend() == "tpu"
    fast_attn = make_attn_fn(on_tpu)

    def encode_classify(params, images, cls, attn_fn):
        feats = l2_normalize(jclip.encode_image(params, cfg, images, attn_fn=attn_fn))
        return (100.0 * feats.astype(jnp.float32) @ cls.T).argmax(-1)

    fast = jax.jit(lambda p, x, c: encode_classify(p, x, c, fast_attn))
    naive = jax.jit(lambda p, x, c: encode_classify(p, x, c, attention_xla))

    t_fast = measure(fast, (params16, images16, classifier))
    t_naive = measure(naive, (params32, images32, classifier), iters=5)

    imgs_per_sec = batch / t_fast
    baseline_ips = batch / t_naive
    print(
        json.dumps(
            {
                "metric": "ViT-B/16 encode+classify throughput (bf16+pallas vs fp32 xla baseline)",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(imgs_per_sec / baseline_ips, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
