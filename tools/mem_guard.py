"""Peak-HBM regression guards (VERDICT r4 item 3).

Asserts XLA's compile-time ``memory_analysis().peak_memory_in_bytes`` for
the memory wins DESIGN.md measures but nothing previously enforced —
lowered from the SHIPPED programs, not replicas:

A) **stage-2 CoOp steps, the real trainer's own jitted ``_step``**
   (``engine/coop.py``), at both loss regimes on ViT-B/16:
   - 400 classes -> the 3-prompt sum loss (1200 prompts differentiate
     through the frozen text tower);
   - 1000 classes -> the >400-class single-random-prompt branch.
   Plain-XLA saved intermediates for the differentiated text tower need
   tens of GB at these shapes (86 GB at 3000 prompts — DESIGN.md backward
   table; compile-time OOM on the 15.75 GiB chip); the remat/fused-VJP
   design must stay inside ``BUDGET_S2``.
B) **21,843-class streaming fusion** (``ops/fusion.py``) must stay inside
   ``BUDGET_FUSION`` (a [M,C] logits materialization at M=21843*64 rows
   would be ~2.8 TiB fp32).

Compile-time analysis is the right instrument: the guarded failure mode
(XLA saving intermediates / a fallback to unchunked fusion) is a
*program-structure* regression visible in buffer assignment, it is
deterministic, and it works through the axon relay, which returns
``memory_stats() = None`` at runtime. Array operands lower from
``jax.ShapeDtypeStruct``s; nothing executes — each guard costs one
(cached) compile. Backends whose AOT pipeline exposes no memory analysis
return -1 and skip the assert LOUDLY.

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
# measured round 5 (v5e compile-time peaks, real trainer steps): stage-2
# 2.68 GiB at 400cls/3-prompt, 2.30 GiB at 1000cls/1-prompt, fusion 2.75
# GiB — see DESIGN.md "Memory guards"; budgets ~1.5-2x measured, all far
# inside the 15.75 GiB chip
BUDGET_S2 = int(4.5 * GIB)
BUDGET_FUSION = int(5.5 * GIB)


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _tree_sds(tree):
    return jax.tree_util.tree_map(
        lambda x: x
        if isinstance(x, jax.ShapeDtypeStruct)
        else _sds(jnp.shape(x), jnp.result_type(x)),
        tree,
    )


def _peak_of(lowerable, *args, **kwargs):
    """Lower+compile and read peak bytes; -1 when the backend's AOT
    pipeline exposes no memory analysis."""
    compiled = lowerable.lower(*args, **kwargs).compile()
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            raise AttributeError("memory_analysis() returned None")
        return int(ma.peak_memory_in_bytes)
    except Exception as e:  # loud skip: the guard cannot run here
        print(f"mem_guard: no compile-time memory analysis ({e}); SKIPPING")
        return -1


def _build_stage2_trainer(n_cls: int):
    """The real CoOp trainer (engine/coop.py) with ViT-B/16-geometry
    random weights and zero vokens, built without a DataManager."""
    from ovmr_tpu.engine.coop import CoOp
    from ovmr_tpu.utils.defaults import get_cfg_default

    cfg = get_cfg_default()
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 2
    cfg.TRAINER.COOP.CTX_INIT = ""
    cfg.TRAINER.COOP.VISUAL_TOKEN_PATH = ""  # zero vokens (shape-identical)
    cfg.MODEL.BACKBONE.NAME = "ViT-B/16"
    cfg.INPUT.SIZE = (224, 224)
    cfg.TPU.DTYPE = "bfloat16"
    cfg.SEED = 1

    trainer = CoOp.__new__(CoOp)
    trainer.cfg = cfg

    class _DS:
        classnames = [f"x {i:04d}" for i in range(n_cls)]

    class _DM:
        dataset = _DS()

    trainer.dm = _DM()
    trainer.build_model()
    return trainer


def compiled_peak_stage2(n_cls: int, batch: int = 32):
    """Peak bytes of the trainer's OWN jitted step at `n_cls` classes
    (>400 takes the single-random-prompt branch, like the real run)."""
    import gc

    trainer = _build_stage2_trainer(n_cls)
    args = (
        _tree_sds(trainer.params),
        _tree_sds(trainer.opt_state),
        _tree_sds(trainer.clip_params),
        _sds((batch, 3, 224, 224), jnp.bfloat16),
        _sds((batch,), jnp.int32),
    )
    peak = _peak_of(trainer._step, *args, prompt_ind=0)
    del trainer  # drops the real device arrays build_model created
    gc.collect()
    return peak


def compiled_peak_fusion_21k(n_cls: int = 21843, shots: int = 64,
                             dim: int = 512):
    """Peak bytes of the shipped streaming fusion at the full
    ImageNet21k-OVR export scale."""
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
    return _peak_of(jax.jit(fusion), *args)


def run_guards(verbose: bool = True):
    """Compile all cases and assert the budgets. Returns the peaks
    (-1 entries mean the backend exposes no analysis; asserts skipped)."""
    peak_s2_3p = compiled_peak_stage2(400)    # 3-prompt regime
    peak_s2_1p = compiled_peak_stage2(1000)   # single-random-prompt regime
    peak_fu = compiled_peak_fusion_21k()
    out = {
        "peak_s2_400cls_3prompt_bytes": peak_s2_3p,
        "peak_s2_1000cls_1prompt_bytes": peak_s2_1p,
        "peak_fusion_bytes": peak_fu,
    }
    if verbose:
        for name, v, budget in (
            ("stage-2 400cls 3-prompt step ", peak_s2_3p, BUDGET_S2),
            ("stage-2 1000cls 1-prompt step", peak_s2_1p, BUDGET_S2),
            ("21k streaming fusion         ", peak_fu, BUDGET_FUSION),
        ):
            shown = f"{v / GIB:.2f} GiB" if v >= 0 else "n/a"
            print(f"{name}: compile-time peak {shown} "
                  f"(budget {budget / GIB:.1f})")
    for name, v in (("400cls/3-prompt", peak_s2_3p),
                    ("1000cls/1-prompt", peak_s2_1p)):
        if v >= 0:
            assert v <= BUDGET_S2, (
                f"stage-2 {name} peak HBM {v / GIB:.2f} GiB exceeds the "
                f"{BUDGET_S2 / GIB:.1f} GiB budget — the remat/fused-VJP "
                "memory win regressed (DESIGN.md backward table)"
            )
    if peak_fu >= 0:
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
