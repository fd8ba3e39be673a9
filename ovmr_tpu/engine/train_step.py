"""Compiled OVMR training step.

One ``jit`` program per split_point value covering the whole reference
``forward_backward`` (``trainers/mm_classifier_one_prompt.py:294-338,
421-452``):

- a class-grouped batch [num_cls, n_ins, 3, H, W] is split at a random
  ``split_point`` into query and exemplar instances (split_point is a STATIC
  argument — it only takes ~n_ins/2 distinct values, each compiled once and
  cached, keeping all shapes static inside the trace);
- both halves run through the frozen CLIP image tower (no gradients flow
  there: only aggregator params are differentiated);
- exemplar features -> vokens (dropout active) -> mm/v classifiers via the
  frozen text tower (gradients DO flow through the text tower into the
  vokens, as in the reference);
- loss = CE(mm_logits) + CE(v_logits) with within-batch labels
  ``arange(num_cls)`` repeated per query instance;
- adam update on the aggregator params only.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.ops.layers import (
    attention_xla,
    l2_normalize,
    residual_block_remat,
)


def _text_tower_block_fn(block_fn, attn_fn):
    """Block fn for the DIFFERENTIATED text tower: the fused Pallas block's
    VJP remats by construction; the XLA fallback gets per-layer
    jax.checkpoint so large class counts don't save 12 layers of
    intermediates (see ops.layers.residual_block_remat)."""
    if block_fn is not None:
        return block_fn

    def remat_block(h, layer_params, n_head, mask):
        return residual_block_remat(h, layer_params, n_head, mask, attn_fn)

    return remat_block


def make_train_step(
    clip_cfg: jclip.CLIPConfig,
    optimizer: optax.GradientTransformation,
    dropout: float = 0.1,
    attn_fn=attention_xla,
    augment: Optional[dict] = None,
    block_fn=None,
):
    """`augment`: when set, the step consumes RAW uint8 class-grouped batches
    ``[num_cls, n_ins, S, S, 3]`` and runs the full on-device augmentation
    recipe (:mod:`ovmr_tpu.ops.augment`) inside the same compiled program —
    one dispatch covers augment + both tower passes + the update."""

    # note: no buffer donation — the trainable state is ~25MB and callers
    # (tests, resume paths) legitimately read pre-step params
    @partial(jax.jit, static_argnames=("split_point",))
    def train_step(
        agg_params: dict,
        opt_state,
        clip_params: dict,
        images: jax.Array,  # [num_cls, n_ins, 3, H, W] float (or uint8 HWC w/ augment)
        prompt_tokens: jax.Array,  # [num_cls, 77]
        eot_idx: jax.Array,  # [num_cls]
        vis_tokens: jax.Array,  # [77]
        rng: jax.Array,
        split_point: int,
    ):
        num_cls, n_ins = images.shape[:2]

        layout = "NCHW"
        if augment is not None:
            from ovmr_tpu.ops.augment import augment_batch

            rng, aug_rng = jax.random.split(rng)
            flat_u8 = images.reshape(num_cls * n_ins, *images.shape[2:])
            # NHWC end-to-end: augment emits NHWC, the patch conv consumes
            # it directly — no relayout between the two
            flat = augment_batch(flat_u8, aug_rng, out_layout="NHWC", **augment)
            images = flat.reshape(num_cls, n_ins, *flat.shape[1:])
            layout = "NHWC"

        img_shape = images.shape[2:]
        query = images[:, :split_point].reshape(num_cls * split_point, *img_shape)
        exemplar = images[:, split_point:].reshape(
            num_cls * (n_ins - split_point), *img_shape
        )

        q_feats = l2_normalize(
            jclip.encode_image(
                clip_params, clip_cfg, query, attn_fn=attn_fn, layout=layout,
                block_fn=block_fn,
            )
        )
        e_feats = l2_normalize(
            jclip.encode_image(
                clip_params, clip_cfg, exemplar, attn_fn=attn_fn, layout=layout,
                block_fn=block_fn,
            )
        ).reshape(num_cls, n_ins - split_point, -1)

        prompt_embeds = jclip.embed_tokens(clip_params, prompt_tokens).astype(
            e_feats.dtype
        )
        vis_embeds = jnp.broadcast_to(
            jclip.embed_tokens(clip_params, vis_tokens[None]).astype(e_feats.dtype),
            (num_cls, vis_tokens.shape[0], e_feats.shape[-1]),
        )

        labels = jnp.repeat(jnp.arange(num_cls), split_point)
        logit_scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)

        def loss_fn(agg_p):
            mm_cls, v_cls, _ = ovmr.classifier_heads(
                clip_params,
                clip_cfg,
                agg_p,
                e_feats,
                prompt_embeds,
                vis_embeds,
                eot_idx,
                dropout=dropout,
                rng=rng,
                attn_fn=attn_fn,
                block_fn=_text_tower_block_fn(block_fn, attn_fn),
            )
            qf = q_feats.astype(jnp.float32)
            mm_logits = logit_scale * qf @ mm_cls.astype(jnp.float32).T
            v_logits = logit_scale * qf @ v_cls.astype(jnp.float32).T
            ce = optax.softmax_cross_entropy_with_integer_labels
            return ce(mm_logits, labels).mean() + ce(v_logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(agg_params)
        updates, new_opt_state = optimizer.update(grads, opt_state, agg_params)
        new_agg_params = optax.apply_updates(agg_params, updates)
        return new_agg_params, new_opt_state, loss

    return train_step


def make_sharded_train_step(
    clip_cfg: jclip.CLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    dropout: float = 0.1,
    attn_fn=attention_xla,
    augment: Optional[dict] = None,
    block_fn=None,
    clip_specs=None,
):
    """Multi-chip train step as an explicit shard_map over the 'data' axis
    (replaces GSPMD auto-partitioning of :func:`make_train_step`; required
    for the fused Pallas kernels, which have no SPMD partitioning rule).

    Collective design (all over ICI):
      - the class-grouped batch shards over 'data' (contiguous class
        blocks); towers and classifier heads run per-chip;
      - per-chip mm/v classifiers ``all_gather`` over 'data' so every chip
        scores its local queries against the GLOBAL class set — exactly the
        reference's within-batch CE semantics (labels arange(num_cls));
      - loss and aggregator grads ``pmean`` over 'data'; the adam update
        runs replicated (identical on every chip).

    Tensor parallelism: with ``clip_specs`` (the split-qkv PartitionSpec
    tree, ``parallel.clip_pspecs``) the same region is manual over BOTH
    mesh axes — tower block leaves enter as 'model' shards and ``block_fn``
    must be the per-chip TP block (``ops.block_fused_tp.make_tp_block``),
    which runs the fused kernels on each head/hidden shard and psums the
    fp32 partials over 'model'. Aggregator math and the update stay
    replicated over 'model' (identical inputs on every model chip — the
    dropout rng folds over 'data' only, deliberately).

    Returns step(agg_params, opt_state, clip_params, images, ptok, eot,
    vis_tokens, rng, split_point) taking GLOBAL arrays; images et al. may be
    pre-placed with a 'data' sharding or passed as host arrays.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["data"]
    if clip_specs is None:
        clip_specs = P()

    def local_fn(agg_params, opt_state, clip_params, images, ptok, eot,
                 vis_tokens, rng, split_point):
        local_cls, n_ins = images.shape[:2]
        dev = jax.lax.axis_index("data")
        # decorrelate per-chip dropout/augment streams
        rng = jax.random.fold_in(rng, dev)

        layout = "NCHW"
        if augment is not None:
            from ovmr_tpu.ops.augment import augment_batch

            rng, aug_rng = jax.random.split(rng)
            flat_u8 = images.reshape(local_cls * n_ins, *images.shape[2:])
            flat = augment_batch(flat_u8, aug_rng, out_layout="NHWC", **augment)
            images = flat.reshape(local_cls, n_ins, *flat.shape[1:])
            layout = "NHWC"

        img_shape = images.shape[2:]
        query = images[:, :split_point].reshape(
            local_cls * split_point, *img_shape
        )
        exemplar = images[:, split_point:].reshape(
            local_cls * (n_ins - split_point), *img_shape
        )
        q_feats = l2_normalize(
            jclip.encode_image(
                clip_params, clip_cfg, query, attn_fn=attn_fn, layout=layout,
                block_fn=block_fn,
            )
        )
        e_feats = l2_normalize(
            jclip.encode_image(
                clip_params, clip_cfg, exemplar, attn_fn=attn_fn,
                layout=layout, block_fn=block_fn,
            )
        ).reshape(local_cls, n_ins - split_point, -1)

        prompt_embeds = jclip.embed_tokens(clip_params, ptok).astype(
            e_feats.dtype
        )
        vis_embeds = jnp.broadcast_to(
            jclip.embed_tokens(clip_params, vis_tokens[None]).astype(
                e_feats.dtype
            ),
            (local_cls, vis_tokens.shape[0], e_feats.shape[-1]),
        )

        # global labels of the local queries: contiguous class blocks per chip
        labels = jnp.repeat(
            jnp.arange(local_cls) + dev * local_cls, split_point
        )
        logit_scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)

        def loss_fn(agg_p):
            mm_cls, v_cls, _ = ovmr.classifier_heads(
                clip_params, clip_cfg, agg_p, e_feats, prompt_embeds,
                vis_embeds, eot, dropout=dropout, rng=rng, attn_fn=attn_fn,
                block_fn=_text_tower_block_fn(block_fn, attn_fn),
            )
            # global classifier set; the transpose (reduce-scatter) routes
            # classifier cotangents back to the owning chip
            mm_all = jax.lax.all_gather(mm_cls, "data", axis=0, tiled=True)
            v_all = jax.lax.all_gather(v_cls, "data", axis=0, tiled=True)
            qf = q_feats.astype(jnp.float32)
            mm_logits = logit_scale * qf @ mm_all.astype(jnp.float32).T
            v_logits = logit_scale * qf @ v_all.astype(jnp.float32).T
            ce = optax.softmax_cross_entropy_with_integer_labels
            return ce(mm_logits, labels).mean() + ce(v_logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(agg_params)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.lax.pmean(grads, "data")
        updates, new_opt_state = optimizer.update(grads, opt_state, agg_params)
        new_agg_params = optax.apply_updates(agg_params, updates)
        return new_agg_params, new_opt_state, loss

    @partial(jax.jit, static_argnames=("split_point",))
    def step(agg_params, opt_state, clip_params, images, ptok, eot,
             vis_tokens, rng, split_point):
        fn = shard_map(
            partial(local_fn, split_point=split_point),
            mesh=mesh,
            in_specs=(
                P(), P(), clip_specs,  # agg, opt, clip (TP: 'model' shards)
                P("data"), P("data"), P("data"),  # images, ptok, eot
                P(), P(),  # vis_tokens, rng
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return fn(
            agg_params, opt_state, clip_params, images, ptok, eot,
            vis_tokens, rng,
        )

    return step


def sample_split_point(py_rng, n_ins: int) -> int:
    """split_point ~ U[n_ins//4, 3*n_ins//4) (reference ``mm_…:300``),
    drawn on host so it stays a static compile-time value."""
    lo, hi = n_ins // 4, (3 * n_ins) // 4
    return int(py_rng.integers(lo, hi)) if hasattr(py_rng, "integers") else int(
        py_rng.randint(lo, hi - 1)
    )
