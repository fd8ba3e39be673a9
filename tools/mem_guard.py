"""Peak-HBM regression guards (VERDICT r4 item 3).

Asserts XLA's compile-time ``memory_analysis().peak_memory_in_bytes`` for
the two memory wins DESIGN.md measures but nothing previously enforced:

A) **stage-2 3000-prompt fwd+bwd** — the 1000-class 3-prompt CoOp loss,
   where plain-XLA saved intermediates need 86 GB (compile-time OOM on the
   15.75 GB chip; DESIGN.md backward table). The fused-VJP/remat design
   must keep the whole step inside ``BUDGET_S2``.
B) **21,843-class streaming fusion** — ``ops/fusion.py`` row-chunked F1
   must stay inside ``BUDGET_FUSION`` (a [M,C] logits materialization at
   M=21843*64 would be ~114 TiB fp32; even one [M,C] one-hot chunk per
   row-block held across the scan would blow the budget).

Compile-time analysis is the right instrument here: the failure mode being
guarded (XLA deciding to save intermediates for backward / a fallback to
unchunked fusion) is a *program-structure* regression visible in buffer
assignment, it is deterministic, and it works through the axon relay,
which returns ``memory_stats() = None`` at runtime. Lowering uses
``jax.ShapeDtypeStruct`` operands, so no arrays are materialized and
nothing executes — the guard costs one (cached) compile per case.

Budgets carry ~1.5x headroom over the measured round-5 peaks so compiler
noise passes but a silent fallback to the memory-hungry recipe fails
loudly. bench.py runs :func:`run_guards` every round; this CLI is the
standalone/debug entry:

    python tools/mem_guard.py          # on the TPU
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

GIB = 2**30
# measured round 5 (v5e compile-time peaks): stage-2 6.39 GiB, fusion
# 2.75 GiB — see DESIGN.md "Memory guards"; budgets ~1.5x measured, both
# far inside the 15.75 GiB chip (plain XLA's stage-2 would need 86 GB)
BUDGET_S2 = int(9.5 * GIB)
BUDGET_FUSION = int(5.5 * GIB)


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _param_sds(tree):
    # eval_shape already yields ShapeDtypeStructs; normalize any real leaves
    return jax.tree_util.tree_map(
        lambda x: x
        if isinstance(x, jax.ShapeDtypeStruct)
        else _sds(jnp.shape(x), jnp.result_type(x)),
        tree,
    )


def compiled_peak_stage2_3000prompt():
    """Compile one 1000-class 3-prompt CoOp fwd+bwd (ctx grads THROUGH the
    frozen text tower, 3000 prompts total) and return XLA's peak bytes."""
    import optax

    from ovmr_tpu.engine.optimizers import build_optimizer
    from ovmr_tpu.engine.train_step import _text_tower_block_fn
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.block_fused import fused_residual_block
    from ovmr_tpu.ops.layers import attention_xla, l2_normalize
    from ovmr_tpu.utils.defaults import get_cfg_default

    on_tpu = jax.default_backend() == "tpu"
    block_fn = fused_residual_block if on_tpu else None
    cfg = jclip.VIT_B16
    n_cls, n_ctx, vok_len, batch = 1000, 4, 2, 32
    dim = cfg.transformer_width
    tail = 77 - 1 - n_ctx - vok_len
    text_block = _text_tower_block_fn(block_fn, attention_xla)
    tx = build_optimizer(get_cfg_default().OPTIM)

    def step(params, prefix, suffix, vis_tail, vokens, eot, p, o, images,
             labels):
        feats = l2_normalize(
            jclip.encode_image(
                params, cfg, images, attn_fn=attention_xla, block_fn=block_fn
            )
        ).astype(jnp.float32)
        scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)

        def loss_fn(pp):
            ctx = jnp.broadcast_to(
                pp["ctx"].astype(jnp.bfloat16)[None], (n_cls, n_ctx, dim)
            )
            mm = jnp.concatenate([prefix, ctx, vokens, suffix[:, :-2]], 1)
            v = jnp.concatenate([prefix, ctx, vokens, vis_tail], 1)
            t = jnp.concatenate([prefix, ctx, suffix], 1)
            total = 0.0
            for embeds, e in ((mm, eot + vok_len), (v, eot + vok_len), (t, eot)):
                f = l2_normalize(
                    jclip.encode_text_embeds(
                        params, cfg, embeds, e,
                        attn_fn=attention_xla, block_fn=text_block,
                    )
                ).astype(jnp.float32)
                total = total + optax.softmax_cross_entropy_with_integer_labels(
                    scale * feats @ f.T, labels
                ).mean()
            return total

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, new_o = tx.update(grads, o, p)
        return optax.apply_updates(p, upd), new_o, loss

    params_sds = _param_sds(
        jax.eval_shape(
            lambda k: jclip.init_params(k, cfg, dtype=jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
    )
    ctx_sds = {"ctx": _sds((n_ctx, dim), jnp.float32)}
    opt_sds = _param_sds(
        jax.eval_shape(tx.init, ctx_sds)
    )
    args = (
        params_sds,
        _sds((n_cls, 1, dim), jnp.bfloat16),          # prefix
        _sds((n_cls, 77 - 1 - n_ctx, dim), jnp.bfloat16),  # suffix
        _sds((n_cls, tail, dim), jnp.bfloat16),       # vis_tail
        _sds((n_cls, vok_len, dim), jnp.bfloat16),    # vokens
        _sds((n_cls,), jnp.int32),                    # eot
        ctx_sds,
        opt_sds,
        _sds((batch, 3, 224, 224), jnp.bfloat16),     # images
        _sds((batch,), jnp.int32),                    # labels
    )
    compiled = jax.jit(step).lower(*args).compile()
    return int(compiled.memory_analysis().peak_memory_in_bytes)


def compiled_peak_fusion_21k(n_cls: int = 21843, shots: int = 64,
                             dim: int = 512):
    """Compile streaming fusion weights at the full ImageNet21k-OVR export
    scale and return XLA's peak bytes."""
    from ovmr_tpu.ops.fusion import streaming_fusion_weights

    def fusion(feats, labels, mm, v, t, scale):
        return streaming_fusion_weights(
            feats, labels, (mm, v, t), scale, tau=10.0
        )

    cls_sds = _sds((n_cls, dim), jnp.bfloat16)
    args = (
        _sds((n_cls * shots, dim), jnp.bfloat16),
        _sds((n_cls * shots,), jnp.int32),
        cls_sds, cls_sds, cls_sds,
        _sds((), jnp.float32),
    )
    compiled = jax.jit(fusion).lower(*args).compile()
    return int(compiled.memory_analysis().peak_memory_in_bytes)


def run_guards(verbose: bool = True):
    """Compile both cases and assert the budgets. Returns the peaks."""
    peak_s2 = compiled_peak_stage2_3000prompt()
    peak_fu = compiled_peak_fusion_21k()
    out = {"peak_s2_bytes": peak_s2, "peak_fusion_bytes": peak_fu}
    if verbose:
        print(
            f"stage-2 3000-prompt fwd+bwd: compile-time peak "
            f"{peak_s2 / GIB:.2f} GiB (budget {BUDGET_S2 / GIB:.1f})"
        )
        print(
            f"21k streaming fusion:        compile-time peak "
            f"{peak_fu / GIB:.2f} GiB (budget {BUDGET_FUSION / GIB:.1f})"
        )
    assert peak_s2 <= BUDGET_S2, (
        f"stage-2 peak HBM {peak_s2 / GIB:.2f} GiB exceeds the "
        f"{BUDGET_S2 / GIB:.1f} GiB budget — the remat/fused-VJP memory "
        "win regressed (DESIGN.md backward table: plain XLA saves 86 GB)"
    )
    assert peak_fu <= BUDGET_FUSION, (
        f"fusion peak HBM {peak_fu / GIB:.2f} GiB exceeds the "
        f"{BUDGET_FUSION / GIB:.1f} GiB budget — the row-streaming "
        "memory win regressed (no [M,C] materialization allowed)"
    )
    return out


if __name__ == "__main__":
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    run_guards()
    print("mem_guard: OK")
