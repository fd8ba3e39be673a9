"""Stage-2 (CoOp) step speed-of-light decomposition on one chip.

The bench's stage-2 step (1000 classes, n_ctx 16, batch 32; the reference
>400-class random-prompt regime, ``coop_mm_classifier.py:317-337``) is:

    image encode fwd (batch 32, frozen)  +  text tower fwd+bwd over 1000
    spliced prompts (ctx grads flow THROUGH the frozen tower)  +  CE/adam
    residue.

This harness times the phases interleaved in one process (the only
methodology that survives the relay noise — docs/DESIGN.md) and compares
each against its matmul-FLOP floor at the chip's sustained-matmul ceiling
(178.8 TFLOP/s bf16, probed by tools/peak_probe.py in round 2). With
frozen params the text backward needs only dX chains (no dW), so the
ideal fwd+bwd is ~2x fwd plus whatever recompute the implementation pays
(the Pallas dx kernels recompute the forward in-kernel -> ~3x; the XLA
fallback pays per-layer remat -> also ~3x).

Run from the repo root: python tools/sol_stage2.py
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

SUSTAINED_TFLOPS = 178.8  # measured sustained matmul rate (peak_probe, r2)


def sustained_ms(step_fn, iters=4, rounds=3):
    _ = float(step_fn())
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = [step_fn() for _ in range(iters)]
        _ = np.asarray(jnp.stack(out))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def text_tflops(n_prompts, cfg, seq=77):
    d = cfg.transformer_width
    macs = n_prompts * seq * cfg.transformer_layers * (12 * d * d + 2 * seq * d)
    macs += n_prompts * seq * d * d  # final projection-ish (ln_final + proj)
    return 2 * macs / 1e12


def image_tflops(batch, cfg):
    d = cfg.vision_width
    tokens = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1
    macs = batch * tokens * cfg.vision_layers * (12 * d * d + 2 * tokens * d)
    macs += batch * (tokens - 1) * d * (3 * cfg.vision_patch_size**2)  # conv1
    macs += batch * d * cfg.embed_dim  # proj
    return 2 * macs / 1e12


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.models import ovmr
    from ovmr_tpu.engine.optimizers import build_optimizer
    from ovmr_tpu.ops.layers import (
        attention_xla,
        l2_normalize,
        residual_block_remat,
    )
    from ovmr_tpu.utils.defaults import get_cfg_default

    block_fn = None
    if jax.default_backend() == "tpu":
        from ovmr_tpu.ops.block_fused import fused_residual_block

        block_fn = fused_residual_block

    def remat_block(h, layer_params, n_head, mask):
        return residual_block_remat(h, layer_params, n_head, mask, attention_xla)

    cfg = jclip.VIT_B16
    key = jax.random.PRNGKey(0)
    s2_cls, n_ctx, s2_batch = 1000, 16, 32
    dim = cfg.transformer_width

    params16 = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
    ptok, eot, _ = ovmr.build_prompt_tokens(
        [f"x {i:04d}" for i in range(s2_cls)]
    )
    emb = jnp.asarray(
        jax.jit(lambda t: jclip.embed_tokens(params16, t))(jnp.asarray(ptok)),
        jnp.bfloat16,
    )
    prefix, suffix = emb[:, :1], emb[:, 1 + n_ctx :]
    eotd = jnp.asarray(eot)
    ctx0 = 0.02 * jax.random.normal(key, (n_ctx, dim), jnp.float32)
    opt = build_optimizer(get_cfg_default().OPTIM)
    state = {"p": {"ctx": ctx0}, "o": opt.init({"ctx": ctx0})}
    images = jax.random.normal(
        jax.random.PRNGKey(3), (s2_batch, 3, 224, 224), jnp.bfloat16
    )
    labels = jnp.arange(s2_batch, dtype=jnp.int32)

    def make_step(block):
        @jax.jit
        def step(clip_p, pre, suf, eot_, p, o, imgs, lab):
            feats_ = l2_normalize(
                jclip.encode_image(
                    clip_p, cfg, imgs, attn_fn=attention_xla, block_fn=block
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
                        attn_fn=attention_xla, block_fn=block,
                    )
                ).astype(jnp.float32)
                return optax.softmax_cross_entropy_with_integer_labels(
                    scale * feats_ @ f.T, lab
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, new_o = opt.update(grads, o, p)
            return optax.apply_updates(p, upd), new_o, loss

        return step

    def step_once(step):
        def run():
            state["p"], state["o"], loss = step(
                params16, prefix, suffix, eotd,
                state["p"], state["o"], images, labels,
            )
            return loss

        return run

    # phase programs ------------------------------------------------------
    @jax.jit
    def img_fwd(clip_p, imgs):
        return jnp.sum(
            jclip.encode_image(
                clip_p, cfg, imgs, attn_fn=attention_xla, block_fn=block_fn
            ).astype(jnp.float32)
        )

    def make_text_fwd(block):
        @jax.jit
        def text_fwd(clip_p, pre, suf, eot_, p):
            ctx = jnp.broadcast_to(
                p["ctx"].astype(jnp.bfloat16)[None], (s2_cls, n_ctx, dim)
            )
            embeds = jnp.concatenate([pre, ctx, suf], axis=1)
            f = jclip.encode_text_embeds(
                clip_p, cfg, embeds, eot_, attn_fn=attention_xla, block_fn=block
            )
            return jnp.sum(f.astype(jnp.float32))

        return text_fwd

    def make_text_fwdbwd(block):
        def inner(p, clip_p, pre, suf, eot_):
            ctx = jnp.broadcast_to(
                p["ctx"].astype(jnp.bfloat16)[None], (s2_cls, n_ctx, dim)
            )
            embeds = jnp.concatenate([pre, ctx, suf], axis=1)
            f = jclip.encode_text_embeds(
                clip_p, cfg, embeds, eot_, attn_fn=attention_xla, block_fn=block
            )
            return jnp.sum(f.astype(jnp.float32))

        @jax.jit
        def fwdbwd(clip_p, pre, suf, eot_, p):
            loss, g = jax.value_and_grad(inner)(p, clip_p, pre, suf, eot_)
            return loss + jnp.sum(g["ctx"])

        return fwdbwd

    # hoist every jitted program OUT of the timed lambdas (a fresh jit
    # wrapper per call would retrace every invocation)
    text_fwd_fused = make_text_fwd(block_fn)
    text_fwdbwd_fused = make_text_fwdbwd(block_fn)
    text_fwdbwd_remat = make_text_fwdbwd(remat_block)
    phases = {
        "full_step_fused": step_once(make_step(block_fn)),
        "full_step_xla_remat": step_once(make_step(remat_block)),
        "image_fwd_b32": lambda: img_fwd(params16, images),
        "text_fwd_1000": lambda: text_fwd_fused(
            params16, prefix, suffix, eotd, state["p"]
        ),
        "text_fwdbwd_1000_fused": lambda: text_fwdbwd_fused(
            params16, prefix, suffix, eotd, state["p"]
        ),
        "text_fwdbwd_1000_xla_remat": lambda: text_fwdbwd_remat(
            params16, prefix, suffix, eotd, state["p"]
        ),
    }

    # interleave: one warmup pass over all phases (compiles), then rounds
    results = {}
    for name, fn in phases.items():
        results[name] = sustained_ms(fn, iters=4, rounds=3)
        print(f"{name:32s} {results[name]:8.1f} ms")

    tf_text = text_tflops(s2_cls, cfg)
    tf_img = image_tflops(s2_batch, cfg)
    sol = {
        "text_fwd_sol_ms": tf_text / SUSTAINED_TFLOPS * 1e3,
        "text_fwdbwd_sol_2x_ms": 2 * tf_text / SUSTAINED_TFLOPS * 1e3,
        "text_fwdbwd_sol_3x_recompute_ms": 3 * tf_text / SUSTAINED_TFLOPS * 1e3,
        "image_fwd_sol_ms": tf_img / SUSTAINED_TFLOPS * 1e3,
    }
    summary = {
        "measured_ms": {k: round(v, 1) for k, v in results.items()},
        "flops_tflop": {"text_fwd": round(tf_text, 2), "image_fwd": round(tf_img, 3)},
        "sol_ms_at_178.8TFs": {k: round(v, 1) for k, v in sol.items()},
        "residue_ms_full_minus_parts": round(
            results["full_step_fused"]
            - results["image_fwd_b32"]
            - results["text_fwdbwd_1000_fused"],
            1,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
