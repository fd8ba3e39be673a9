"""High-level plug-and-play API.

The reference's product is the exported classifier artifact
(``mm_classifiers.pt``) that drops into other projects' open-vocabulary
heads. This module gives programmatic access to the same flow without the
trainer/CLI machinery:

    import ovmr_tpu.api as ovmr_api

    gen = ovmr_api.OVMRGenerator.from_checkpoints(
        clip_ckpt="~/.cache/clip/ViT-B-16.pt",
        generator_ckpt="checkpoints/prompt_learner/model.pth.tar-30",
    )
    out = gen.generate(classnames, exemplar_images)   # images [N, K, 3, H, W]
    # out: text/vision/mm classifiers [N, D], fusion_weight [N, 3]
    probs = gen.classify(images, out, mode="fusion")
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.ops.attention import make_attn_fn
from ovmr_tpu.ops.layers import l2_normalize


class OVMRGenerator:
    def __init__(self, clip_params, clip_cfg, agg_params, dtype=jnp.bfloat16):
        self.clip_cfg = clip_cfg
        self.dtype = dtype
        self.clip_params = jclip.cast_params(
            jax.tree_util.tree_map(jnp.asarray, clip_params), dtype
        )
        self.agg_params = jax.tree_util.tree_map(jnp.asarray, agg_params)
        self.attn_fn = make_attn_fn(None)
        # the shipped TPU fast path (same selection as the trainers): fused
        # Pallas blocks; Mosaic doesn't compile on CPU backends
        self.block_fn = None
        if jax.default_backend() == "tpu" and dtype != jnp.float16:
            from ovmr_tpu.ops.block_fused import fused_residual_block

            self.block_fn = fused_residual_block
        self._encode = jax.jit(
            lambda p, x: l2_normalize(
                jclip.encode_image(
                    p, self.clip_cfg, x, attn_fn=self.attn_fn,
                    block_fn=self.block_fn,
                )
            )
        )

    @classmethod
    def from_checkpoints(
        cls,
        clip_ckpt: str,
        generator_ckpt: Optional[str] = None,
        n_ctx: int = 2,
        dtype=jnp.bfloat16,
    ) -> "OVMRGenerator":
        """`clip_ckpt` is a torch checkpoint path OR a backbone name
        ("ViT-B/16", "TINY", ...) resolved via the model zoo; unknown /
        unreachable checkpoints fall back to seeded random towers (smoke
        mode), matching the trainer's behavior so artifacts interoperate."""
        from ovmr_tpu.models.import_torch import load_clip, load_prompt_learner

        path = osp.expanduser(clip_ckpt)
        if not osp.exists(path):
            from ovmr_tpu.models.zoo import resolve

            resolved = resolve(clip_ckpt)
            if resolved is None:
                print(
                    f"WARNING: no local CLIP checkpoint for {clip_ckpt!r}; "
                    "using RANDOM weights (smoke-run mode)"
                )
                clip_cfg = jclip.CONFIGS.get(clip_ckpt, jclip.VIT_B16)
                clip_params = jclip.init_params(jax.random.PRNGKey(0), clip_cfg)
                if generator_ckpt:
                    agg_params, _ = load_prompt_learner(
                        osp.expanduser(generator_ckpt)
                    )
                else:
                    agg_params = init_aggregator(
                        jax.random.PRNGKey(0), width=clip_cfg.embed_dim, n_ctx=n_ctx
                    )
                return cls(clip_params, clip_cfg, agg_params, dtype=dtype)
            path = resolved

        clip_params, clip_cfg = load_clip(path)
        if generator_ckpt:
            agg_params, _ = load_prompt_learner(osp.expanduser(generator_ckpt))
        else:
            agg_params = init_aggregator(
                jax.random.PRNGKey(0), width=clip_cfg.embed_dim, n_ctx=n_ctx
            )
        return cls(clip_params, clip_cfg, agg_params, dtype=dtype)

    # ------------------------------------------------------------------
    def encode_images(self, images, batch_size: int = 1024) -> np.ndarray:
        """images [B, 3, H, W] float (CLIP-normalized) -> unit features.
        Encodes in `batch_size` slices so exemplar sets at ImageNet-21k
        scale (349k images at 16 shots) never materialize one giant
        device array; the tail pads up to the slice so at most two
        programs compile."""
        images = np.asarray(images)
        if images.shape[0] <= batch_size:
            return np.asarray(
                self._encode(
                    self.clip_params, jnp.asarray(images, self.dtype)
                ),
                np.float32,
            )
        parts = []
        for s in range(0, images.shape[0], batch_size):
            chunk = images[s : s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            feats = self._encode(
                self.clip_params, jnp.asarray(chunk, self.dtype)
            )
            parts.append(np.asarray(feats, np.float32))
        return np.concatenate(parts)[: images.shape[0]]

    def generate(
        self,
        classnames: Sequence[str],
        exemplar_images,
        eval_tau: float = 10.0,
    ) -> Dict[str, np.ndarray]:
        """classnames [N] + exemplar images [N, K, 3, H, W] -> classifiers."""
        exemplar_images = np.asarray(exemplar_images)
        n, k = exemplar_images.shape[:2]
        feats = self.encode_images(
            exemplar_images.reshape(n * k, *exemplar_images.shape[2:])
        ).reshape(n, k, -1)
        return self.generate_from_features(classnames, feats, eval_tau=eval_tau)

    def _chunk_programs(self):
        """Jitted per-chunk text/heads programs, built once and reused
        across generate_from_features calls (cold compiles are expensive
        on this platform; same recipe as the trainer's cached
        _jit_text_classifier/_jit_heads)."""
        if not hasattr(self, "_chunk_programs_cache"):

            def jit_text(cp, pt):
                return ovmr.text_classifier(
                    cp, self.clip_cfg, pt, attn_fn=self.attn_fn,
                    block_fn=self.block_fn,
                )

            def jit_heads(cp, ap, feats, pt, et, vt):
                m = feats.shape[0]
                pe = jclip.embed_tokens(cp, pt).astype(feats.dtype)
                ve = jnp.broadcast_to(
                    jclip.embed_tokens(cp, vt[None]).astype(feats.dtype),
                    (m, vt.shape[0], feats.shape[-1]),
                )
                return ovmr.classifier_heads(
                    cp, self.clip_cfg, ap, feats, pe, ve, et,
                    attn_fn=self.attn_fn, block_fn=self.block_fn,
                )

            self._chunk_programs_cache = (jax.jit(jit_text), jax.jit(jit_heads))
        return self._chunk_programs_cache

    def generate_from_features(
        self,
        classnames: Sequence[str],
        exemplar_feats: np.ndarray,
        eval_tau: float = 10.0,
        chunk_size: int = 2048,
        max_text_classes: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Class counts above ``chunk_size`` run the class axis in chunks
        (one compiled program reused per chunk, shared with the trainer via
        :func:`ovmr.generate_classifiers_chunked` — bounds text-tower
        activations at ImageNet-21k scale); the preference fusion then runs
        once over the full set, streaming exemplar rows so the F1
        cross-validation never materializes [n*k, n] logits. 2048 is the
        measured-fastest chunk on chip (docs/DESIGN.md).

        ``max_text_classes`` mirrors the reference's >=5000-class guard
        (``mm_…:118-126``): at or above it the frozen text head and the
        fusion that depends on it are skipped (keys absent from the
        result). Default is the reference's 5000; pass a larger value to
        force the full artifact at 21k scale."""
        ptok, eot, vtok = ovmr.build_prompt_tokens(classnames)
        n = len(classnames)
        limit = (
            ovmr.TEXT_CLS_MAX_CLASSES
            if max_text_classes is None
            else int(max_text_classes)
        )
        include_text = n < limit
        if not include_text:
            print(
                f"Skipping frozen text classifier: {n} classes >= "
                f"max_text_classes ({limit}, the reference >=5000-class "
                "guard); text_classifier/fusion_weight omitted."
            )
        if n <= chunk_size and include_text:
            t_cls = ovmr.text_classifier(
                self.clip_params, self.clip_cfg, jnp.asarray(ptok),
                attn_fn=self.attn_fn, block_fn=self.block_fn,
            )
            out = ovmr.generate_classifiers_from_feats(
                self.clip_params,
                self.clip_cfg,
                self.agg_params,
                jnp.asarray(exemplar_feats, self.dtype),
                jnp.asarray(ptok),
                jnp.asarray(eot),
                jnp.asarray(vtok),
                t_cls,
                eval_tau=eval_tau,
                attn_fn=self.attn_fn,
                block_fn=self.block_fn,
            )
            return {key: np.asarray(v, np.float32) for key, v in out.items()}

        # the shared chunked recipe (one compiled program reused per chunk,
        # padded with the visual-template row — models/ovmr.py). The
        # exemplar set moves to device ONCE in the compute dtype; chunks
        # and the fusion scan both read that copy (at 21k scale the
        # features are the dominant host->device transfer)
        jit_text, jit_heads = self._chunk_programs()
        vtok_dev = jnp.asarray(vtok)
        feats_dev = jnp.asarray(
            np.asarray(exemplar_feats, np.float32), self.dtype
        )
        out = ovmr.generate_classifiers_chunked(
            feats_dev,
            ptok,
            eot,
            vtok,
            chunk_size,
            jit_heads=lambda f, pt, et: jit_heads(
                self.clip_params, self.agg_params, f, pt, et, vtok_dev
            ),
            jit_text=(
                (lambda pt: jit_text(self.clip_params, pt))
                if include_text
                else None
            ),
            feats_dtype=self.dtype,
        )
        if include_text:
            logit_scale = np.exp(
                np.asarray(self.clip_params["logit_scale"], np.float32)
            )
            # feats_dev is rounded through self.dtype, so fusion sees the
            # SAME values as the single-program path — fusion_weight must
            # not depend on which side of chunk_size N falls. No eager fp32
            # widening: every fusion path casts per row chunk (bf16->fp32
            # is exact), halving peak HBM on the 21k path
            out["fusion_weight"] = np.asarray(
                ovmr.fusion_from_classifiers(
                    feats_dev,
                    jnp.asarray(out["mm_classifier"]),
                    jnp.asarray(out["vision_classifier"]),
                    jnp.asarray(out["text_classifier"]),
                    logit_scale,
                    float(eval_tau),
                ),
                np.float32,
            )
        return out

    def classify(
        self, images, classifiers: Dict[str, np.ndarray], mode: str = "fusion"
    ) -> np.ndarray:
        feats = self.encode_images(images)
        scale = float(np.exp(np.asarray(self.clip_params["logit_scale"])))
        dev = {k: jnp.asarray(v) for k, v in classifiers.items()}
        return np.asarray(ovmr.eval_logits(jnp.asarray(feats), dev, scale, mode))

    def export(self, classifiers: Dict[str, np.ndarray], output_dir: str) -> None:
        """Write reference-compatible mm_classifiers.pt / visual_tokens.pt."""
        from ovmr_tpu.engine.checkpoint import export_classifiers_torch

        export_classifiers_torch(classifiers, output_dir)


def load_exported_classifiers(path: str) -> Dict[str, np.ndarray]:
    """Read a (reference or ours) ``mm_classifiers.pt`` artifact."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    return {k: np.asarray(v.float()) for k, v in data.items()}
