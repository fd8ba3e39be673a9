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

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.aggregator import generate_vokens
from ovmr_tpu.ops.fusion import (
    fusion_weights_from_f1,
    multiclass_f1,
    streaming_fusion_weights,
)
from ovmr_tpu.ops.layers import attention_xla, l2_normalize

# The reference skips building the frozen zero-shot text classifier at
# >= 5000 classes (``mm_…:118-126``) — a build-time optimization for the
# ImageNet-21k pretrain, where the text head is never needed for training.
# (At that scale the reference cannot eval at all: ``forward_prompt``
# dereferences the None classifier, ``mm_…:265``.) Consumed via
# ``cfg.TPU.TEXT_CLS_MAX_CLASSES`` in the trainer and ``max_text_classes``
# in the API; override upward to force the text head + fusion at 21k scale.
TEXT_CLS_MAX_CLASSES = 5000


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
    fusion_weight = fusion_from_classifiers(
        exemplar_feats,
        mm_cls,
        v_cls,
        zero_shot_classifier,
        logit_scale,
        eval_tau,
        class_mask=class_mask,
    )

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
    row_chunk: int = 8192,
    mesh=None,
    mesh_axis: str = "data",
) -> jax.Array:
    """Preference-fusion weights from precomputed classifiers: per-class F1
    of each classifier on the exemplars -> softmax(tau * F1) [N, 3].
    Factored out of :func:`generate_classifiers_from_feats` so classifier
    heads can be computed in class chunks at 21k scale while fusion runs
    once over the full set.

    When the exemplar-row count n*k exceeds ``row_chunk``, the logits are
    streamed over row chunks inside one compiled scan (working set
    [row_chunk, N] fp32 instead of [n*k, N] — 122 GB at 21,843 classes x
    64 shots). Per-row logits/argmax are independent of chunking, so both
    paths produce identical F1 counts; equality is pinned by
    ``tests/test_streaming_fusion.py``.

    With a ``mesh`` whose ``mesh_axis`` is >1 (and the streaming path
    active), exemplar rows shard over that axis and the F1 count vectors
    psum — same bits, per-chip FLOPs divided by the axis size (see
    :func:`ovmr_tpu.ops.fusion.streaming_fusion_weights_sharded`)."""
    n, k, d = exemplar_feats.shape
    m = n * k
    labels = jnp.repeat(jnp.arange(n), k)
    scale = jnp.asarray(logit_scale, jnp.float32)

    if (
        mesh is not None
        and dict(mesh.shape).get(mesh_axis, 1) > 1
        and m > row_chunk
    ):
        from ovmr_tpu.ops.fusion import streaming_fusion_weights_sharded

        return streaming_fusion_weights_sharded(
            mesh,
            exemplar_feats.reshape(m, d),
            labels,
            (mm_cls, v_cls, t_cls),
            scale,
            eval_tau,
            axis=mesh_axis,
            class_mask=class_mask,
            row_chunk=row_chunk,
        )

    if m > row_chunk:
        return streaming_fusion_weights(
            exemplar_feats.reshape(m, d),
            labels,
            (mm_cls, v_cls, t_cls),
            scale,
            eval_tau,
            class_mask=class_mask,
            row_chunk=row_chunk,
        )

    flat = exemplar_feats.reshape(m, d).astype(jnp.float32)

    def cls_logits(cls_matrix):
        logits = scale * flat @ cls_matrix.astype(jnp.float32).T
        if class_mask is not None:
            logits = jnp.where(class_mask[None, :], logits, -jnp.inf)
        return logits

    f1_mm = multiclass_f1(cls_logits(mm_cls), labels, n)
    f1_v = multiclass_f1(cls_logits(v_cls), labels, n)
    f1_t = multiclass_f1(cls_logits(t_cls), labels, n)
    return fusion_weights_from_f1(f1_mm, f1_v, f1_t, eval_tau)


def generate_classifiers_chunked(
    exemplar_feats: np.ndarray,
    prompt_tokens: np.ndarray,
    eot_idx: np.ndarray,
    vis_tokens: np.ndarray,
    chunk: int,
    jit_heads: Callable,
    jit_text: Optional[Callable] = None,
    place: Callable = lambda x: x,
    feats_dtype=jnp.float32,
) -> dict:
    """THE chunked classifier-generation recipe, shared by the trainer
    (mesh-sharded via ``place``) and the API (single device).

    Pads the class axis to a multiple of ``chunk`` with the visual-template
    row (so every chunk reuses one compiled program), runs the per-chunk
    text/heads callables, and concatenates back to ``n_cls`` rows on host.
    This bounds text-tower activations at ImageNet-21k scale; preference
    fusion is the caller's job (it needs the full class set — see
    :func:`fusion_from_classifiers`).

    Args:
      exemplar_feats: [N, K, D] L2-normalized features — a host fp32 array
        or an already-device array. Converted to ``feats_dtype`` and moved
        to device ONCE; chunks are device slices (the exemplar set ships
        through the (slow, on this relay) host link once, not per chunk).
      prompt_tokens/eot_idx/vis_tokens: from :func:`build_prompt_tokens`.
      chunk: classes per compiled program (caller picks: cfg knob, mesh
        divisibility).
      jit_heads: (feats [c,K,D], ptok [c,77], eot [c]) -> (mm, v, vokens);
        jitted, params closed over.
      jit_text: (ptok [c,77]) -> [c, D], or None to skip the frozen text
        head (the reference's >=5000-class guard, ``mm_…:118-126``).
      place: device/shard placement hook applied to every chunk array.
      feats_dtype: device dtype for the feature chunks (the compute dtype).

    Returns dict of np.float32 arrays: ``mm_classifier``/``vision_classifier``
    [N, D], ``visual_tokens`` [N, n_ctx, D], and ``text_classifier`` [N, D]
    only when ``jit_text`` was given.
    """
    from ovmr_tpu.text import eot_indices

    n_cls = exemplar_feats.shape[0]
    vis = np.asarray(vis_tokens)
    pad_n = -chunk * (-n_cls // chunk)
    ptok_p = np.tile(vis, (pad_n, 1)).astype(np.int32)
    ptok_p[:n_cls] = np.asarray(prompt_tokens)
    eot_p = np.full(pad_n, int(eot_indices(vis[None])[0]), np.int32)
    eot_p[:n_cls] = np.asarray(eot_idx)
    feats_p = jnp.asarray(exemplar_feats, feats_dtype)  # the one transfer
    if pad_n > n_cls:
        feats_p = jnp.pad(
            feats_p, ((0, pad_n - n_cls),) + ((0, 0),) * (feats_p.ndim - 1)
        )

    mm_parts, v_parts, vt_parts, t_parts = [], [], [], []
    for start in range(0, pad_n, chunk):
        sl = slice(start, start + chunk)
        ptok_c = place(jnp.asarray(ptok_p[sl]))
        if jit_text is not None:
            t_parts.append(jit_text(ptok_c))
        mm_c, v_c, vt_c = jit_heads(
            place(feats_p[sl]),
            ptok_c,
            place(jnp.asarray(eot_p[sl])),
        )
        mm_parts.append(mm_c)
        v_parts.append(v_c)
        vt_parts.append(vt_c)

    def cat(parts):
        return np.concatenate([np.asarray(p, np.float32) for p in parts])[:n_cls]

    out = {
        "mm_classifier": cat(mm_parts),
        "vision_classifier": cat(v_parts),
        "visual_tokens": cat(vt_parts),
    }
    if jit_text is not None:
        out["text_classifier"] = cat(t_parts)
    return out


def _require_text_head(classifiers: dict, mode: str) -> None:
    """Refuse text/fusion eval against an artifact whose text head was
    skipped by the >=5000-class guard, instead of a raw KeyError. Covers
    every eval surface (trainer, infer.py, api.classify) — the trainer's
    prepare_test repeats this with config-level wording."""
    needed = {"text": ("text_classifier",),
              "fusion": ("text_classifier", "fusion_weight")}.get(mode, ())
    missing = [k for k in needed if k not in classifiers]
    if missing:
        raise ValueError(
            f"eval mode {mode!r} needs {', '.join(missing)}, which this "
            "artifact omits (generated at >= TEXT_CLS_MAX_CLASSES classes "
            "— the reference >=5000-class guard; the reference itself cannot "
            "eval at that scale at all). Use vision/multimodal, or "
            "regenerate with a higher TPU.TEXT_CLS_MAX_CLASSES."
        )


def eval_logits_np(
    image_feats: "np.ndarray",
    classifiers: dict,
    logit_scale: float,
    mode: str,
) -> "np.ndarray":
    """Host-side numpy twin of :func:`eval_logits` for [B, D] feature blocks
    (the per-batch classifier matmul + softmax is tiny; running it on host
    avoids an extra device dispatch per eval batch)."""
    _require_text_head(classifiers, mode)

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

    _require_text_head(classifiers, mode)

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
