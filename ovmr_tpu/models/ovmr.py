"""OVMR classifier generation: prompt splicing + multi-modal classifier heads.

The system (reference ``trainers/mm_classifier_one_prompt.py``):

1. tokenize ``"a {classname}."`` per class and the visual template ``"a ."``;
2. compress K normalized exemplar image features per class into ``n_ctx``
   vokens with the aggregator;
3. splice vokens into the prompt embeddings after the first two positions:
   ``[tok[:, :2], vokens, tok[:, 2:77-n_ctx]]`` (reference ``:156-157``);
4. run the frozen CLIP text tower over the spliced embeddings, gathering the
   pooled feature at ``eot_idx + n_ctx`` for the multi-modal prompt and at
   ``1 + n_ctx`` for the vision prompt — the latter intentionally points at
   the LAST VOKEN, not the EOT; this reference quirk (``:165``) is
   reproduced, not fixed;
5. L2-normalize -> per-class classifier rows.

Fusion: per-class F1 of each classifier on the exemplars themselves ->
``softmax(tau * F1)`` -> per-class blend of softmaxed logits
(see :mod:`ovmr_tpu.ops.fusion`).

Everything here is shape-static and jit/pjit-friendly: class counts are
padded by the caller, per-dataset variation lives in data, not in traces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.aggregator import generate_vokens
from ovmr_tpu.ops.fusion import fusion_weights_from_f1, multiclass_f1
from ovmr_tpu.ops.layers import attention_xla, l2_normalize


@dataclasses.dataclass(frozen=True)
class OVMRConfig:
    n_ctx: int = 2
    context_length: int = 77
    eval_tau: float = 10.0
    dropout: float = 0.1
    # skip the zero-shot text classifier beyond this many classes
    # (reference guard at 5000, ``mm_…:118``)
    max_text_classifier_classes: int = 5000


# --------------------------------------------------------------------------
# host-side prompt state
# --------------------------------------------------------------------------

def build_prompt_tokens(classnames) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize ``"a {name}."`` per class plus the ``"a ."`` visual template.

    Returns (prompt_tokens [N,77] int32, eot_idx [N] int32,
    vis_tokens [77] int32). Underscores in classnames become spaces
    (reference ``mm_…:109``).
    """
    from ovmr_tpu.text import tokenize, eot_indices

    names = [str(n).replace("_", " ") for n in classnames]
    prompts = [f"a {n}." for n in names]
    prompt_tokens = tokenize(prompts)
    eot_idx = eot_indices(prompt_tokens).astype(np.int32)
    vis_tokens = tokenize(["a ."])[0]
    return prompt_tokens, eot_idx, vis_tokens


# --------------------------------------------------------------------------
# device-side pieces
# --------------------------------------------------------------------------

def splice_prompts(
    prompt_embeds: jax.Array, vokens: jax.Array
) -> jax.Array:
    """[N, 77, D] embeddings + [N, n_ctx, D] vokens -> [N, 77, D] spliced."""
    n_ctx = vokens.shape[1]
    return jnp.concatenate(
        [
            prompt_embeds[:, :2],
            vokens.astype(prompt_embeds.dtype),
            prompt_embeds[:, 2 : prompt_embeds.shape[1] - n_ctx],
        ],
        axis=1,
    )


def classifier_heads(
    clip_params: dict,
    clip_cfg: jclip.CLIPConfig,
    agg_params: dict,
    exemplar_feats: jax.Array,
    prompt_embeds: jax.Array,
    vis_embeds: jax.Array,
    eot_idx: jax.Array,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_fn=attention_xla,
    block_fn=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exemplar features -> (mm_classifier [N,D], v_classifier [N,D], vokens).

    exemplar_feats [N, K, D] must already be L2-normalized.
    """
    vokens = generate_vokens(
        agg_params, exemplar_feats, dropout=dropout, rng=rng, attn_fn=attn_fn
    )
    n_ctx = vokens.shape[1]

    mm_prompts = splice_prompts(prompt_embeds, vokens)
    v_prompts = splice_prompts(vis_embeds, vokens)

    mm_eos = eot_idx.astype(jnp.int32) + n_ctx
    # reference quirk: the vision-prompt gather lands on the last voken
    v_eos = jnp.full_like(mm_eos, 1 + n_ctx)

    mm_feats = jclip.encode_text_embeds(
        clip_params, clip_cfg, mm_prompts, mm_eos, attn_fn=attn_fn,
        block_fn=block_fn,
    )
    v_feats = jclip.encode_text_embeds(
        clip_params, clip_cfg, v_prompts, v_eos, attn_fn=attn_fn,
        block_fn=block_fn,
    )
    # normalize -> (mean over the single prompt variant) -> normalize,
    # mirroring get_mm_v_feats (``mm_…:200-212``); with one variant the double
    # normalization is idempotent but kept for drop-in parity
    mm_feats = l2_normalize(l2_normalize(mm_feats))
    v_feats = l2_normalize(l2_normalize(v_feats))
    return mm_feats, v_feats, vokens


def text_classifier(
    clip_params: dict,
    clip_cfg: jclip.CLIPConfig,
    prompt_tokens: jax.Array,
    attn_fn=attention_xla,
    block_fn=None,
) -> jax.Array:
    """Frozen zero-shot text classifier: encode ``"a {name}."`` per class and
    L2-normalize (reference ``mm_…:118-125``; one prompt per class, so the
    prompt-group mean is the identity)."""
    feats = jclip.encode_text(
        clip_params, clip_cfg, prompt_tokens, attn_fn=attn_fn, block_fn=block_fn
    )
    return l2_normalize(feats)


# --------------------------------------------------------------------------
# full classifier generation (eval path)
# --------------------------------------------------------------------------

def generate_classifiers_from_feats(
    clip_params: dict,
    clip_cfg: jclip.CLIPConfig,
    agg_params: dict,
    exemplar_feats: jax.Array,
    prompt_tokens: jax.Array,
    eot_idx: jax.Array,
    vis_tokens: jax.Array,
    zero_shot_classifier: jax.Array,
    eval_tau: float,
    class_mask: Optional[jax.Array] = None,
    attn_fn=attention_xla,
    block_fn=None,
) -> dict:
    """All-class classifier generation + preference fusion.

    Args:
      exemplar_feats: [N, K, D] L2-normalized exemplar image features.
      prompt_tokens/eot_idx: [N, 77]/[N] from :func:`build_prompt_tokens`.
      vis_tokens: [77] visual template token row.
      zero_shot_classifier: [N, D] from :func:`text_classifier`.
      class_mask: [N] bool; False rows are padding classes (excluded from
        F1 logits and zeroed in outputs).

    Returns dict with ``mm_classifier``/``vision_classifier`` [N, D],
    ``fusion_weight`` [N, 3] (mm, v, t column order) and ``visual_tokens``
    [N, n_ctx, D].
    """
    n, k, d = exemplar_feats.shape

    prompt_embeds = jclip.embed_tokens(clip_params, prompt_tokens)
    vis_embeds = jnp.broadcast_to(
        jclip.embed_tokens(clip_params, vis_tokens[None]), (n,) + (vis_tokens.shape[0], d)
    )
    prompt_embeds = prompt_embeds.astype(exemplar_feats.dtype)
    vis_embeds = vis_embeds.astype(exemplar_feats.dtype)

    mm_cls, v_cls, vokens = classifier_heads(
        clip_params,
        clip_cfg,
        agg_params,
        exemplar_feats,
        prompt_embeds,
        vis_embeds,
        eot_idx,
        dropout=0.0,
        rng=None,
        attn_fn=attn_fn,
        block_fn=block_fn,
    )

    # cross-validate the three classifiers on the exemplars themselves
    logit_scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)
    flat = exemplar_feats.reshape(n * k, d).astype(jnp.float32)
    labels = jnp.repeat(jnp.arange(n), k)

    def cls_logits(cls_matrix):
        logits = logit_scale * flat @ cls_matrix.astype(jnp.float32).T
        if class_mask is not None:
            logits = jnp.where(class_mask[None, :], logits, -jnp.inf)
        return logits

    f1_mm = multiclass_f1(cls_logits(mm_cls), labels, n)
    f1_v = multiclass_f1(cls_logits(v_cls), labels, n)
    f1_t = multiclass_f1(cls_logits(zero_shot_classifier), labels, n)
    fusion_weight = fusion_weights_from_f1(f1_mm, f1_v, f1_t, eval_tau)

    if class_mask is not None:
        mm_cls = jnp.where(class_mask[:, None], mm_cls, 0.0)
        v_cls = jnp.where(class_mask[:, None], v_cls, 0.0)

    return {
        "mm_classifier": mm_cls,
        "vision_classifier": v_cls,
        "text_classifier": zero_shot_classifier,
        "fusion_weight": fusion_weight,
        "visual_tokens": vokens,
    }


def fusion_from_classifiers(
    exemplar_feats: jax.Array,
    mm_cls: jax.Array,
    v_cls: jax.Array,
    t_cls: jax.Array,
    logit_scale: jax.Array,
    eval_tau: float,
    class_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Preference-fusion weights from precomputed classifiers: per-class F1
    of each classifier on the exemplars -> softmax(tau * F1) [N, 3].
    Factored out of :func:`generate_classifiers_from_feats` so classifier
    heads can be computed in class chunks at 21k scale while fusion runs
    once over the full set."""
    n, k, d = exemplar_feats.shape
    flat = exemplar_feats.reshape(n * k, d).astype(jnp.float32)
    labels = jnp.repeat(jnp.arange(n), k)
    scale = jnp.asarray(logit_scale, jnp.float32)

    def cls_logits(cls_matrix):
        logits = scale * flat @ cls_matrix.astype(jnp.float32).T
        if class_mask is not None:
            logits = jnp.where(class_mask[None, :], logits, -jnp.inf)
        return logits

    f1_mm = multiclass_f1(cls_logits(mm_cls), labels, n)
    f1_v = multiclass_f1(cls_logits(v_cls), labels, n)
    f1_t = multiclass_f1(cls_logits(t_cls), labels, n)
    return fusion_weights_from_f1(f1_mm, f1_v, f1_t, eval_tau)


def eval_logits_np(
    image_feats: "np.ndarray",
    classifiers: dict,
    logit_scale: float,
    mode: str,
) -> "np.ndarray":
    """Host-side numpy twin of :func:`eval_logits` for [B, D] feature blocks
    (the per-batch classifier matmul + softmax is tiny; running it on host
    avoids an extra device dispatch per eval batch)."""

    def probs(cls):
        logits = float(logit_scale) * image_feats.astype(np.float32) @ np.asarray(
            cls, np.float32
        ).T
        logits -= logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=-1, keepdims=True)

    if mode == "text":
        return probs(classifiers["text_classifier"])
    if mode == "vision":
        return probs(classifiers["vision_classifier"])
    if mode == "multimodal":
        return probs(classifiers["mm_classifier"])
    if mode == "fusion":
        three = np.stack(
            [
                probs(classifiers["mm_classifier"]),
                probs(classifiers["vision_classifier"]),
                probs(classifiers["text_classifier"]),
            ],
            axis=-1,
        )
        return (three * np.asarray(classifiers["fusion_weight"], np.float32)[None]).sum(-1)
    raise ValueError(f"unknown EVAL_MODE {mode!r}")


def eval_logits(
    image_feats: jax.Array,
    classifiers: dict,
    logit_scale: jax.Array,
    mode: str,
) -> jax.Array:
    """Per-mode eval logits over normalized image features [B, D]
    (reference ``mm_…:348-363``). Returns softmaxed scores for every mode,
    matching what the reference feeds the evaluator."""
    from ovmr_tpu.ops.fusion import fuse_probs

    scale = jnp.asarray(logit_scale, jnp.float32)
    feats = image_feats.astype(jnp.float32)

    def probs(cls):
        return jax.nn.softmax(scale * feats @ cls.astype(jnp.float32).T, axis=-1)

    if mode == "text":
        return probs(classifiers["text_classifier"])
    if mode == "vision":
        return probs(classifiers["vision_classifier"])
    if mode == "multimodal":
        return probs(classifiers["mm_classifier"])
    if mode == "fusion":
        return fuse_probs(
            probs(classifiers["mm_classifier"]),
            probs(classifiers["vision_classifier"]),
            probs(classifiers["text_classifier"]),
            classifiers["fusion_weight"],
        )
    raise ValueError(f"unknown EVAL_MODE {mode!r}")
