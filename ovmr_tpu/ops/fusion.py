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


def _pad_rows(
    flat_feats: jax.Array, labels: jax.Array, n: int, pad_m: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pad exemplar rows to ``pad_m``: label marker ``n`` (dropped by
    bincount's length clamp) + zero validity weight, so padding rows
    contribute nothing to the counts."""
    m = flat_feats.shape[0]
    feats_p = jnp.pad(flat_feats, ((0, pad_m - m), (0, 0)))
    labels_p = jnp.pad(
        labels.astype(jnp.int32), (0, pad_m - m), constant_values=n
    )
    valid_p = jnp.pad(jnp.ones(m, jnp.float32), (0, pad_m - m))
    return feats_p, labels_p, valid_p


def _f1_count_scan(
    feats_p: jax.Array,
    labels_p: jax.Array,
    valid_p: jax.Array,
    cls3: Sequence[jax.Array],
    scale: jax.Array,
    class_mask: Optional[jax.Array],
):
    """Scan over [steps, row_chunk, ...] exemplar rows, accumulating the
    (tp, pred_count, label_count) [C] fp32 count tuple per classifier.
    Counts are nonnegative integers (< 2^24 at any realistic scale), so
    fp32 accumulation is exact and order-independent — chunked, unchunked
    and cross-shard-psum'd results are bit-identical."""
    n = cls3[0].shape[0]

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
    counts, _ = jax.lax.scan(
        body,
        tuple(zero for _ in cls3),
        (feats_p, labels_p, valid_p),
    )
    return counts


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
    feats_p, labels_p, valid_p = _pad_rows(
        flat_feats, labels, n, steps * row_chunk
    )
    (mm_c, v_c, t_c) = _f1_count_scan(
        feats_p.reshape(steps, row_chunk, d),
        labels_p.reshape(steps, row_chunk),
        valid_p.reshape(steps, row_chunk),
        cls3,
        scale,
        class_mask,
    )
    return fusion_weights_from_f1(
        f1_from_counts(*mm_c), f1_from_counts(*v_c), f1_from_counts(*t_c), tau
    )


def streaming_fusion_weights_sharded(
    mesh,
    flat_feats: jax.Array,
    labels: jax.Array,
    classifiers: Sequence[jax.Array],
    logit_scale: jax.Array,
    tau: float,
    axis: str = "data",
    class_mask: Optional[jax.Array] = None,
    row_chunk: int = 8192,
) -> jax.Array:
    """Mesh-sharded :func:`streaming_fusion_weights`: exemplar ROWS shard
    over ``axis`` (the F1 cross-validation is embarrassingly row-parallel),
    each chip scans its local rows against the replicated [C, D]
    classifiers, and the [C] count vectors ``psum`` over the axis before
    the (replicated) F1 -> softmax epilogue.

    Counts are integers in fp32, so the psum is exact: the result is
    bit-identical to the single-device path (pinned by
    ``tests/test_streaming_fusion.py``). At 21,843 classes x 64 shots the
    per-chip work drops by the axis size (~94 TFLOP of fp32 logits matmul
    split across the mesh); the classifiers (3 x [C, D] fp32, ~134 MB at
    21k) replicate, riding ICI once.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    shards = dict(mesh.shape)[axis]
    m, d = flat_feats.shape
    n = classifiers[0].shape[0]
    scale = jnp.asarray(logit_scale, jnp.float32)
    cls3 = tuple(c.astype(jnp.float32) for c in classifiers)

    steps = max(1, -(-m // (row_chunk * shards)))
    pad_m = steps * row_chunk * shards
    feats_p, labels_p, valid_p = _pad_rows(flat_feats, labels, n, pad_m)

    def local(feats_s, labels_s, valid_s, cls3_s, scale_s, mask_s):
        counts = _f1_count_scan(
            feats_s.reshape(steps, row_chunk, d),
            labels_s.reshape(steps, row_chunk),
            valid_s.reshape(steps, row_chunk),
            cls3_s,
            scale_s,
            mask_s,
        )
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis), counts
        )

    row = P(axis)
    rep = P()
    # prefix specs: `rep` covers the whole cls3 tuple / the (possibly
    # empty) class_mask subtree; a bare `rep` out_spec covers all counts
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(row, row, row, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    # place the row-sharded inputs explicitly so the (possibly eager) call
    # doesn't reshard from a committed single device
    feats_p = jax.device_put(feats_p, NamedSharding(mesh, row))
    labels_p = jax.device_put(labels_p, NamedSharding(mesh, row))
    valid_p = jax.device_put(valid_p, NamedSharding(mesh, row))
    (mm_c, v_c, t_c) = fn(
        feats_p, labels_p, valid_p, cls3, scale, class_mask
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
