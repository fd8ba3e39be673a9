"""Per-class F1 and preference-based fusion math.

Replicates the reference's cross-validation recipe
(``trainers/mm_classifier_one_prompt.py:261-274``): per-class multiclass F1
of each classifier evaluated on the exemplar set itself, turned into fusion
weights via ``softmax(tau * F1)`` over the three classifiers, then a
per-class weighted blend of the softmaxed logits
(``:357-363``). F1 semantics match ``torcheval.multiclass_f1_score``
(average=None): 0 where a class has no support and no predictions.

Memory note: F1 only needs argmax predictions, so everything here is
computed from count vectors (``jnp.bincount``/segment-sum under the hood)
— O(M + C) memory, never an ``[M, C]`` one-hot. The exemplar-row logits
``flat @ cls.T`` are the one unavoidable [rows, C] tensor; the streaming
path (:func:`streaming_fusion_weights`) bounds it to ``row_chunk`` rows at
a time inside a ``lax.scan`` so the 21,843-class x 64-shot cross-validation
(1.4M rows — a 122 GB logits matrix if materialized) runs in a single
compiled program with a ~[row_chunk, C] working set.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def f1_from_counts(
    tp: jax.Array, pred_count: jax.Array, label_count: jax.Array
) -> jax.Array:
    """Per-class F1 from [C] count vectors: 2tp / (2tp + fp + fn)."""
    denom = pred_count + label_count  # == 2tp + fp + fn
    return jnp.where(
        denom > 0, 2.0 * tp.astype(jnp.float32) / jnp.maximum(denom, 1.0), 0.0
    ).astype(jnp.float32)


def f1_counts_from_preds(
    preds: jax.Array,
    labels: jax.Array,
    num_classes: int,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(tp, pred_count, label_count) [C] from argmax predictions.

    ``weights`` (fp32, same shape as preds) marks row validity — pass 0.0
    for padding rows so they contribute nothing; labels >= num_classes
    (padding markers) are dropped by bincount's length clamp.
    """
    w = (
        jnp.ones(preds.shape, jnp.float32)
        if weights is None
        else weights.astype(jnp.float32)
    )
    correct = jnp.where(preds == labels, labels, num_classes)
    tp = jnp.bincount(correct, weights=w, length=num_classes)
    pred_count = jnp.bincount(preds, weights=w, length=num_classes)
    label_count = jnp.bincount(labels, weights=w, length=num_classes)
    return tp, pred_count, label_count


def multiclass_f1(
    logits: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """Per-class F1 from argmax predictions. logits [M, C], labels [M] -> [C]."""
    preds = jnp.argmax(logits, axis=-1)
    return f1_from_counts(*f1_counts_from_preds(preds, labels, num_classes))


def fusion_weights_from_f1(
    f1_mm: jax.Array, f1_v: jax.Array, f1_t: jax.Array, tau: float
) -> jax.Array:
    """Stack per-class F1 of (mm, vision, text) -> softmax(tau * F1) [C, 3].

    Column order is (mm, v, t), matching the reference's concatenation order
    (``mm_…:272``) and the fusion einsum consuming it (``mm_…:361-362``).
    """
    stacked = jnp.stack([f1_mm, f1_v, f1_t], axis=-1).astype(jnp.float32)
    return jax.nn.softmax(tau * stacked, axis=-1)


def streaming_fusion_weights(
    flat_feats: jax.Array,
    labels: jax.Array,
    classifiers: Sequence[jax.Array],
    logit_scale: jax.Array,
    tau: float,
    class_mask: Optional[jax.Array] = None,
    row_chunk: int = 8192,
) -> jax.Array:
    """Preference-fusion weights without materializing [M, C] anything.

    Args:
      flat_feats: [M, D] exemplar features (any float dtype; logits are
        computed in fp32, matching the reference's ``.float()`` F1 inputs).
      labels: [M] int class ids.
      classifiers: (mm, v, t) each [C, D] — column order of the output.
      row_chunk: exemplar rows per scan step; the fp32 logits working set
        is [row_chunk, C]. When M <= row_chunk the scan has one step, so
        small-N results are bit-identical to the unchunked recipe (each
        row's logits/argmax are independent of every other row).

    Returns fusion_weight [C, 3] fp32.
    """
    m, d = flat_feats.shape
    n = classifiers[0].shape[0]
    scale = jnp.asarray(logit_scale, jnp.float32)
    cls3 = [c.astype(jnp.float32) for c in classifiers]

    steps = max(1, -(-m // row_chunk))
    pad_m = steps * row_chunk
    feats_p = jnp.pad(flat_feats, ((0, pad_m - m), (0, 0))).reshape(
        steps, row_chunk, d
    )
    # padding rows: label marker n (dropped by bincount) + zero weight
    labels_p = jnp.pad(
        labels.astype(jnp.int32), (0, pad_m - m), constant_values=n
    ).reshape(steps, row_chunk)
    valid_p = jnp.pad(jnp.ones(m, jnp.float32), (0, pad_m - m)).reshape(
        steps, row_chunk
    )

    def body(carry, xs):
        f, lab, w = xs
        f = f.astype(jnp.float32)
        new_carry = []
        for cls_matrix, acc in zip(cls3, carry):
            logits = scale * f @ cls_matrix.T
            if class_mask is not None:
                logits = jnp.where(class_mask[None, :], logits, -jnp.inf)
            preds = jnp.argmax(logits, axis=-1)
            counts = f1_counts_from_preds(preds, lab, n, weights=w)
            new_carry.append(tuple(a + c for a, c in zip(acc, counts)))
        return tuple(new_carry), None

    zero = tuple(jnp.zeros(n, jnp.float32) for _ in range(3))
    (mm_c, v_c, t_c), _ = jax.lax.scan(
        body, (zero, zero, zero), (feats_p, labels_p, valid_p)
    )
    return fusion_weights_from_f1(
        f1_from_counts(*mm_c), f1_from_counts(*v_c), f1_from_counts(*t_c), tau
    )


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
