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
    def encode_images(self, images) -> np.ndarray:
        """images [B, 3, H, W] float (CLIP-normalized) -> unit features."""
        return np.asarray(
            self._encode(self.clip_params, jnp.asarray(images, self.dtype)),
            np.float32,
        )

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

    def generate_from_features(
        self,
        classnames: Sequence[str],
        exemplar_feats: np.ndarray,
        eval_tau: float = 10.0,
    ) -> Dict[str, np.ndarray]:
        ptok, eot, vtok = ovmr.build_prompt_tokens(classnames)
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
