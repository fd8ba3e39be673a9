"""Zero-shot CLIP trainers.

Re-implements the reference ``trainers/zsclip.py`` (which is broken in the
snapshot — it imports a missing module — but is part of the paper baseline):

- ZeroshotCLIP: per-dataset hand-crafted prompt template
  (``CUSTOM_TEMPLATES``), one text feature per class;
- ZeroshotCLIP2: prompt ensembling over IMAGENET_TEMPLATES_SELECT (7
  templates; the reference keeps the 80-template IMAGENET_TEMPLATES
  commented out) plus the dataset's custom template — EXCEPT for
  ImageNet, which the reference skips (``zsclip.py:67-83``). Features
  are averaged over templates THEN normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.engine.trainer import (
    TRAINER_REGISTRY,
    TrainerBase,
    _dtype_from_cfg,
    load_or_init_clip,
    setup_trainer_mesh,
)
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.attention import make_attn_fn
from ovmr_tpu.ops.layers import l2_normalize
from ovmr_tpu.text import CUSTOM_TEMPLATES, IMAGENET_TEMPLATES_SELECT, tokenize


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(TrainerBase):
    def get_templates(self):
        template = CUSTOM_TEMPLATES.get(self.cfg.DATASET.NAME, "a photo of a {}.")
        return [template]

    def build_model(self):
        cfg = self.cfg
        self.dtype = _dtype_from_cfg(cfg)
        self.attn_fn = make_attn_fn(
            cfg.TPU.USE_PALLAS_ATTENTION if jax.default_backend() == "tpu" else False
        )
        self.block_fn = None
        if cfg.TPU.USE_FUSED_BLOCK and jax.default_backend() == "tpu":
            from ovmr_tpu.ops.block_fused import fused_residual_block

            self.block_fn = fused_residual_block
        clip_params, self.clip_cfg = load_or_init_clip(cfg)
        self.clip_params = jclip.cast_params(
            jax.tree_util.tree_map(jnp.asarray, clip_params), self.dtype
        )
        # same mesh policy as the training trainers: eval encode shards
        # over 'data' (shard_map keeps per-chip Pallas); model>1 TP-places
        # the towers (split-QKV + per-chip kernels inside the shard_map
        # eval seam when divisible, else the legacy gated-XLA GSPMD route)
        from ovmr_tpu.engine.trainer import tp_seam_tools

        (self.mesh, self._tp, self.clip_params, self.block_fn,
         self.attn_fn) = setup_trainer_mesh(
            cfg, self.clip_params, self.block_fn, self.attn_fn,
            label="ZeroshotCLIP", clip_cfg=self.clip_cfg,
        )
        self._tp_block_fn, self._clip_specs = tp_seam_tools(
            self.mesh, self._tp, self.clip_params
        )

        classnames = [c.replace("_", " ") for c in self.dm.dataset.classnames]
        templates = self.get_templates()

        encode = jax.jit(
            lambda p, t: jclip.encode_text(
                p, self.clip_cfg, t, attn_fn=self.attn_fn,
                block_fn=self.block_fn,
            )
        )
        feats_sum = None
        for template in templates:
            tokens = jnp.asarray(tokenize([template.format(c) for c in classnames]))
            f = encode(self.clip_params, tokens).astype(jnp.float32)
            f = l2_normalize(f)
            feats_sum = f if feats_sum is None else feats_sum + f
        self.text_classifier = np.asarray(l2_normalize(feats_sum / len(templates)))

    def train(self):
        print("ZeroshotCLIP has nothing to train; running test()")
        self.init_writer()
        return self.test()

    def prepare_test(self):
        if getattr(self, "_features", None) is None:
            from ovmr_tpu.engine.trainer import make_feature_extractor

            cfg = self.cfg
            self._features = make_feature_extractor(
                self.clip_cfg, self.attn_fn, self.dtype,
                cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
                cfg.DATALOADER.TEST.BATCH_SIZE,
                mesh=self.mesh,
                block_fn=self.block_fn,
                u8_normalize=("normalize" in cfg.INPUT.TRANSFORMS),
                tp_block_fn=self._tp_block_fn,
                clip_specs=self._clip_specs,
            )
        print("(eval mode: zero-shot)")

    def model_inference(self, batch, scale_no=0):
        logit_scale = float(np.exp(np.asarray(self.clip_params["logit_scale"])))
        feats = self._features(self.clip_params, batch["img"])
        return logit_scale * feats @ self.text_classifier.T

    def load_model(self, directory, epoch=None):
        pass  # nothing to load


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(ZeroshotCLIP):
    """Prompt-ensembling variant: SELECT templates + the dataset template
    (reference ``zsclip.py:63-99`` adds the custom template to the
    ensemble — EXCEPT for ImageNet, ``zsclip.py:82-83``)."""

    def get_templates(self):
        templates = list(IMAGENET_TEMPLATES_SELECT)
        if self.cfg.DATASET.NAME != "ImageNet":
            templates.append(
                CUSTOM_TEMPLATES.get(self.cfg.DATASET.NAME, "a photo of a {}.")
            )
        return templates
