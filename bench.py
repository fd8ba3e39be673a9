"""Benchmark: CLIP ViT-B/16 encode + classify throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": "img/s/chip", "vs_baseline": x}

The reference publishes no throughput numbers (BASELINE.json.published = {}),
so the baseline is the NAIVE path of this framework — fp32 params with
plain-XLA attention, i.e. the direct translation of the torch module —
measured on this chip with the same protocol:
  fp32-xla, batch 256, sustained: 177.3 ms/batch -> 1444 img/s
(recorded 2026-08-16 on TPU v5e via `python bench.py --full`, which
re-measures it; the default run skips the ~5-minute fp32 compile).

Platform note: this environment reaches the chip through a relay where each
dispatch costs ~25-30 ms and `block_until_ready` does not synchronize, so
timings queue several steps and fetch a scalar once.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 1444.0  # fp32 + XLA attention, batch 256, see docstring


def sustained_ms(f, args, iters=8, rounds=3):
    """Best-of-N rounds: the relay to this chip shows large run-to-run
    variance (shared pool); the minimum is the least-contended estimate."""
    _ = float(f(*args))  # compile + first run
    best = float("inf")
    for _round in range(rounds):
        t0 = time.perf_counter()
        sums = [f(*args) for _ in range(iters)]
        _ = np.asarray(jnp.stack(sums))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.layers import attention_xla, l2_normalize

    cfg = jclip.VIT_B16
    key = jax.random.PRNGKey(0)
    batch, n_classes = 256, 1000

    params16 = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
    images16 = jax.random.normal(key, (batch, 3, 224, 224), jnp.bfloat16)
    classifier = l2_normalize(
        jax.random.normal(key, (n_classes, cfg.embed_dim), jnp.float32)
    )

    def encode_classify(params, images, cls):
        feats = l2_normalize(
            jclip.encode_image(params, cfg, images, attn_fn=attention_xla)
        ).astype(jnp.float32)
        return jnp.sum(jnp.argmax(100.0 * feats @ cls.T, -1))

    fast = jax.jit(encode_classify)
    t_fast = sustained_ms(fast, (params16, images16, classifier))
    imgs_per_sec = batch / (t_fast / 1e3)

    baseline = BASELINE_IMG_PER_SEC
    if "--full" in sys.argv:
        params32 = jclip.init_params(key, cfg, dtype=jnp.float32)
        images32 = images16.astype(jnp.float32)
        t_naive = sustained_ms(fast, (params32, images32, classifier), iters=5)
        baseline = batch / (t_naive / 1e3)

    print(
        json.dumps(
            {
                "metric": "ViT-B/16 encode+classify throughput, bf16 (baseline: fp32 naive path, same chip)",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
