"""Per-class F1 and preference-based fusion math.

Replicates the reference's cross-validation recipe
(``trainers/mm_classifier_one_prompt.py:261-274``): per-class multiclass F1
of each classifier evaluated on the exemplar set itself, turned into fusion
weights via ``softmax(tau * F1)`` over the three classifiers, then a
per-class weighted blend of the softmaxed logits
(``:357-363``). F1 semantics match ``torcheval.multiclass_f1_score``
(average=None): 0 where a class has no support and no predictions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multiclass_f1(
    logits: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """Per-class F1 from argmax predictions. logits [M, C], labels [M] -> [C]."""
    preds = jnp.argmax(logits, axis=-1)
    pred_onehot = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    label_onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    tp = jnp.sum(pred_onehot * label_onehot, axis=0)
    pred_count = jnp.sum(pred_onehot, axis=0)
    label_count = jnp.sum(label_onehot, axis=0)
    denom = pred_count + label_count  # == 2tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1.0), 0.0)


def fusion_weights_from_f1(
    f1_mm: jax.Array, f1_v: jax.Array, f1_t: jax.Array, tau: float
) -> jax.Array:
    """Stack per-class F1 of (mm, vision, text) -> softmax(tau * F1) [C, 3].

    Column order is (mm, v, t), matching the reference's concatenation order
    (``mm_…:272``) and the fusion einsum consuming it (``mm_…:361-362``).
    """
    stacked = jnp.stack([f1_mm, f1_v, f1_t], axis=-1).astype(jnp.float32)
    return jax.nn.softmax(tau * stacked, axis=-1)


def fuse_probs(
    mm_probs: jax.Array,
    v_probs: jax.Array,
    t_probs: jax.Array,
    fusion_weight: jax.Array,
) -> jax.Array:
    """Per-class blend: probs [B, C] each, fusion_weight [C, 3] -> [B, C].

    Equivalent to the reference ``einsum("bmn,mn->bmn", stack3, w).sum(-1)``.
    """
    three = jnp.stack([mm_probs, v_probs, t_probs], axis=-1)  # [B, C, 3]
    return jnp.sum(three * fusion_weight[None, :, :], axis=-1)
