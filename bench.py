"""Benchmark: OVMR hot paths on one TPU chip. Prints ONE JSON line.

Metrics, all measured in the same run (no hard-coded constants):
  - eval encode+classify (ViT-B/16 bf16, batch 256)  <- headline value
  - train step (frozen towers + aggregator grad, batch 1536 = 192cls x 8ins)
  - classifier generation (1024 classes x 16 shots, mm+v+t heads + fusion)
  - stage-2 CoOp step (1000 classes, ctx grads through the frozen text
    tower — the Pallas dx backward path)
  - zoo eval recipes (ViT-L/14 b128, ViT-B/32 b256, RN50 b256) — the
    per-model kernel routing the docs advertise, regression-guarded

The reference publishes no throughput numbers (BASELINE.json.published = {}),
so vs_baseline compares the headline against this framework's NAIVE path —
fp32 params with plain-XLA attention, the direct translation of the torch
module — measured in the SAME process right before the bf16 run (interleaved
A/B is the only timing methodology that survives this chip's relay noise;
see docs/DESIGN.md). Compiles amortize across runs via the persistent
compilation cache.

Platform note: the relay costs ~25-30 ms per dispatch and
`block_until_ready` does not synchronize, so timing loops queue several
steps and fetch one scalar at the end.
"""

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sustained_ms(step_fn, iters=8, rounds=3):
    """Best-of-N rounds of (queue `iters` calls, sync once via scalar fetch).
    `step_fn()` must return a jax scalar to fetch. The minimum round is the
    least-contended estimate on this shared-pool relay."""
    _ = float(step_fn())  # compile + first run
    best = float("inf")
    for _round in range(rounds):
        t0 = time.perf_counter()
        out = [step_fn() for _ in range(iters)]
        _ = np.asarray(jnp.stack(out))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.block_fused import fused_residual_block
    from ovmr_tpu.ops.layers import attention_xla, l2_normalize

    # the shipped TPU fast path (TPU.USE_FUSED_BLOCK default): block-fused
    # Pallas kernels; the baseline keeps the naive XLA translation
    block_fn = (
        fused_residual_block if jax.default_backend() == "tpu" else None
    )

    cfg = jclip.VIT_B16
    key = jax.random.PRNGKey(0)
    batch, n_classes = 256, 1000
    quick = "--quick" in sys.argv  # skip the fp32 baseline (debug only)

    classifier = l2_normalize(
        jax.random.normal(key, (n_classes, cfg.embed_dim), jnp.float32)
    )

    def encode_classify(params, images, cls, block, mcfg=cfg):
        feats = l2_normalize(
            jclip.encode_image(
                params, mcfg, images, attn_fn=attention_xla, block_fn=block
            )
        ).astype(jnp.float32)
        return jnp.sum(jnp.argmax(100.0 * feats @ cls.T, -1))

    fast = jax.jit(lambda p, x, c: encode_classify(p, x, c, block_fn))
    naive = jax.jit(lambda p, x, c: encode_classify(p, x, c, None))

    # ---- baseline: fp32 naive path, measured in-run ----------------------
    baseline_img_s = None
    if not quick:
        params32 = jclip.init_params(key, cfg, dtype=jnp.float32)
        images32 = jax.random.normal(key, (batch, 3, 224, 224), jnp.float32)
        t_naive = sustained_ms(
            lambda: naive(params32, images32, classifier), iters=5, rounds=2
        )
        baseline_img_s = batch / (t_naive / 1e3)
        del params32, images32
        gc.collect()

    # ---- headline: bf16 eval encode+classify -----------------------------
    params16 = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
    images16 = jax.random.normal(key, (batch, 3, 224, 224), jnp.bfloat16)
    t_fast = sustained_ms(lambda: fast(params16, images16, classifier))
    eval_img_s = batch / (t_fast / 1e3)
    del images16
    gc.collect()

    # ---- train step: 192 classes x 8 instances (shipped config batch) ----
    import optax

    from ovmr_tpu.engine.optimizers import build_optimizer
    from ovmr_tpu.engine.train_step import make_train_step
    from ovmr_tpu.models import ovmr
    from ovmr_tpu.models.aggregator import init_aggregator
    from ovmr_tpu.utils.defaults import get_cfg_default

    num_cls, n_ins = 192, 8
    train_batch = num_cls * n_ins
    agg = init_aggregator(key, width=cfg.embed_dim, layers=4, n_ctx=2)
    optimizer = build_optimizer(get_cfg_default().OPTIM)
    opt_state = optimizer.init(agg)
    step = make_train_step(
        cfg, optimizer, dropout=0.1, attn_fn=attention_xla, block_fn=block_fn
    )

    ptok, eot, vtok = ovmr.build_prompt_tokens(
        [f"object {i:03d}" for i in range(num_cls)]
    )
    ptok_d, eot_d, vtok_d = (
        jnp.asarray(ptok), jnp.asarray(eot), jnp.asarray(vtok)
    )
    train_images = jax.random.normal(
        key, (num_cls, n_ins, 3, 224, 224), jnp.bfloat16
    )

    state = {"agg": agg, "opt": opt_state, "rng": jax.random.PRNGKey(1)}

    def train_step_once():
        state["rng"], sub = jax.random.split(state["rng"])
        state["agg"], state["opt"], loss = step(
            state["agg"], state["opt"], params16, train_images,
            ptok_d, eot_d, vtok_d, sub, 4,
        )
        return loss

    t_train = sustained_ms(train_step_once, iters=4, rounds=3)
    train_img_s = train_batch / (t_train / 1e3)

    # ---- sustained soak: 60 consecutive full-scale steps ------------------
    # the flat-band/no-HBM-growth guard behind DESIGN.md's pretrain
    # extrapolation (tools/soak.py is the long-form 200-step harness)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.soak import mem_snapshot

    def hbm_in_use():
        snap = mem_snapshot()
        return snap.get("bytes_in_use", -1) if snap else -1

    hbm_pre = hbm_in_use()
    soak_ms = []
    for _ in range(60):
        t0 = time.perf_counter()
        loss = train_step_once()
        float(loss)  # sync (block_until_ready is a no-op on the relay)
        soak_ms.append((time.perf_counter() - t0) * 1e3)
    soak = np.asarray(soak_ms)
    hbm_post = hbm_in_use()
    sustained_p50 = float(np.percentile(soak, 50))
    sustained_p95 = float(np.percentile(soak, 95))
    # median-based drift: robust to one-off relay contention spikes, which
    # this shared pool produces; a real regression (allocator creep, queue
    # back-pressure) shifts the whole tail window
    sustained_drift = float(
        np.median(soak[-15:]) / np.median(soak[:15]) - 1.0
    )
    hbm_growth = hbm_post - hbm_pre if hbm_pre >= 0 else None
    # steady-state must stay flat and HBM must not creep step-over-step
    assert sustained_drift < 0.25, (
        f"sustained step time drifted {sustained_drift:+.1%} over 60 steps"
    )
    if hbm_growth is not None:
        assert hbm_growth < 256 * 2**20, (
            f"HBM in_use grew {hbm_growth / 2**20:.0f} MiB over 60 steps"
        )
    del train_images
    gc.collect()

    # ---- peak-HBM regression guards (tools/mem_guard.py) ------------------
    # asserts the remat/fused-VJP stage-2 (the REAL trainer step, both loss
    # regimes) and row-streaming fusion memory wins every round (compile-
    # time budgets with headroom; fails loudly on regression)
    from tools.mem_guard import run_guards

    mem_peaks = run_guards(verbose=False)

    # ---- classifier generation: 1024 classes x 16 shots ------------------
    gen_cls, shots = 1024, 16
    feats = l2_normalize(
        jax.random.normal(key, (gen_cls, shots, cfg.embed_dim), jnp.bfloat16)
    )
    gptok, geot, _ = ovmr.build_prompt_tokens(
        [f"thing {i:04d}" for i in range(gen_cls)]
    )
    gptok_d, geot_d = jnp.asarray(gptok), jnp.asarray(geot)

    @jax.jit
    def gen_once(clip_p, agg_p, f, pt, e):
        t_cls = ovmr.text_classifier(
            clip_p, cfg, pt, attn_fn=attention_xla, block_fn=block_fn
        )
        out = ovmr.generate_classifiers_from_feats(
            clip_p, cfg, agg_p, f, pt, e, vtok_d, t_cls, eval_tau=10.0,
            attn_fn=attention_xla, block_fn=block_fn,
        )
        return (
            jnp.sum(out["mm_classifier"].astype(jnp.float32))
            + jnp.sum(out["fusion_weight"])
        )

    t_gen = sustained_ms(
        lambda: gen_once(params16, agg, feats, gptok_d, geot_d),
        iters=4, rounds=3,
    )
    gen_s_per_1024 = t_gen / 1e3
    del feats
    gc.collect()

    # ---- stage-2 CoOp step: 1000 classes, batch 32 ------------------------
    # reference >400-class mode (one random prompt per step,
    # coop_mm_classifier.py:317-337): ctx grads flow THROUGH the frozen
    # text tower — the Pallas dx backward path
    s2_cls, n_ctx, s2_batch = 1000, 16, 32
    dim = cfg.transformer_width
    s2_ptok, s2_eot, _ = ovmr.build_prompt_tokens(
        [f"x {i:04d}" for i in range(s2_cls)]
    )
    s2_emb = jnp.asarray(
        jax.jit(lambda t: jclip.embed_tokens(params16, t))(
            jnp.asarray(s2_ptok)
        ),
        jnp.bfloat16,
    )
    prefix, suffix = s2_emb[:, :1], s2_emb[:, 1 + n_ctx :]
    s2_eotd = jnp.asarray(s2_eot)
    ctx0 = 0.02 * jax.random.normal(key, (n_ctx, dim), jnp.float32)
    s2_opt = build_optimizer(get_cfg_default().OPTIM)
    s2_state = {"p": {"ctx": ctx0}, "o": s2_opt.init({"ctx": ctx0})}
    s2_images = jax.random.normal(
        jax.random.PRNGKey(3), (s2_batch, 3, 224, 224), jnp.bfloat16
    )
    s2_labels = jnp.arange(s2_batch, dtype=jnp.int32)

    @jax.jit
    def s2_step(clip_p, pre, suf, eot_, p, o, imgs, labels):
        feats_ = l2_normalize(
            jclip.encode_image(
                clip_p, cfg, imgs, attn_fn=attention_xla, block_fn=block_fn
            )
        ).astype(jnp.float32)
        scale = jnp.exp(clip_p["logit_scale"]).astype(jnp.float32)

        def loss_fn(pp):
            ctx = jnp.broadcast_to(
                pp["ctx"].astype(jnp.bfloat16)[None], (s2_cls, n_ctx, dim)
            )
            embeds = jnp.concatenate([pre, ctx, suf], axis=1)
            f = l2_normalize(
                jclip.encode_text_embeds(
                    clip_p, cfg, embeds, eot_,
                    attn_fn=attention_xla, block_fn=block_fn,
                )
            ).astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(
                scale * feats_ @ f.T, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, new_o = s2_opt.update(grads, o, p)
        return optax.apply_updates(p, upd), new_o, loss

    def s2_once():
        s2_state["p"], s2_state["o"], loss = s2_step(
            params16, prefix, suffix, s2_eotd,
            s2_state["p"], s2_state["o"], s2_images, s2_labels,
        )
        return loss

    t_s2 = sustained_ms(s2_once, iters=4, rounds=3)
    del s2_images, s2_emb, prefix, suffix
    gc.collect()

    # ---- zoo eval recipes: every backbone the docs advertise -------------
    # regression guards for the per-model routing (docs/ROADMAP.md ViT-L /
    # RN50 sections): ViT-L/14 takes the g=2 attention + g=2 resident-MLP
    # chunked recipe, ViT-B/32 the standard tiles, RN50 the plain-XLA
    # ModifiedResNet path (no transformer blocks to fuse)
    def zoo_eval_ms(name, zbatch):
        mcfg = jclip.CONFIGS[name]
        res = mcfg.image_resolution
        p = jclip.init_params(key, mcfg, dtype=jnp.bfloat16)
        imgs = jax.random.normal(key, (zbatch, 3, res, res), jnp.bfloat16)
        cls_ = l2_normalize(
            jax.random.normal(key, (n_classes, mcfg.embed_dim), jnp.float32)
        )
        bf = None if mcfg.is_resnet else block_fn
        f = jax.jit(
            lambda p_, x_, c_: encode_classify(p_, x_, c_, bf, mcfg)
        )
        t = sustained_ms(lambda: f(p, imgs, cls_), iters=6, rounds=2)
        del p, imgs, cls_
        gc.collect()
        return t

    t_vitl = zoo_eval_ms("ViT-L/14", 128)
    t_b32 = zoo_eval_ms("ViT-B/32", 256)
    t_rn50 = zoo_eval_ms("RN50", 256)

    result = {
        "metric": (
            "ViT-B/16 encode+classify throughput, bf16 block-fused Pallas "
            "(baseline: fp32 naive XLA path measured same-run, same chip)"
        ),
        "value": round(eval_img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": (
            round(eval_img_s / baseline_img_s, 3) if baseline_img_s else None
        ),
        "extra": {
            "baseline_fp32_img_s": (
                round(baseline_img_s, 1) if baseline_img_s else None
            ),
            "train_step_img_s": round(train_img_s, 1),
            "train_step_ms_batch1536": round(t_train, 1),
            "classifier_gen_s_per_1024cls": round(gen_s_per_1024, 3),
            "eval_ms_batch256": round(t_fast, 1),
            "stage2_coop_step_ms_1000cls": round(t_s2, 1),
            "vitl14_eval_ms_batch128": round(t_vitl, 1),
            "vitb32_eval_ms_batch256": round(t_b32, 1),
            "rn50_eval_ms_batch256": round(t_rn50, 1),
            "sustained60_p50_ms": round(sustained_p50, 1),
            "sustained60_p95_ms": round(sustained_p95, 1),
            "sustained60_drift_pct": round(sustained_drift * 100, 1),
            "sustained60_hbm_growth_mib": (
                round(hbm_growth / 2**20, 1) if hbm_growth is not None else None
            ),
            "peak_hbm_stage2_400c3p_gib": (
                round(mem_peaks["peak_s2_400cls_3prompt_bytes"] / 2**30, 2)
                if mem_peaks["peak_s2_400cls_3prompt_bytes"] >= 0 else None
            ),
            "peak_hbm_stage2_1000c1p_gib": (
                round(mem_peaks["peak_s2_1000cls_1prompt_bytes"] / 2**30, 2)
                if mem_peaks["peak_s2_1000cls_1prompt_bytes"] >= 0 else None
            ),
            "peak_hbm_fusion21k_gib": (
                round(mem_peaks["peak_fusion_bytes"] / 2**30, 2)
                if mem_peaks["peak_fusion_bytes"] >= 0 else None
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
