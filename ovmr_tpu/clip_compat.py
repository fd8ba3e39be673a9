"""OpenAI-clip-shaped compatibility API.

Downstream reference users import the vendored ``clip`` package directly
(``from clip import clip; model, preprocess = clip.load("ViT-B/16")``,
reference ``clip/clip.py:79-186``). This module mirrors that surface on
the JAX towers so such call sites port one-for-one:

    from ovmr_tpu import clip_compat as clip

    model, preprocess = clip.load("ViT-B/16")
    image = preprocess(Image.open("cat.png"))[None]
    text = clip.tokenize(["a cat", "a dog"])
    image_features = model.encode_image(image)
    text_features = model.encode_text(text)
    logits_per_image, logits_per_text = model(image, text)

``load`` resolves checkpoints exactly like the trainers (env var > cache >
download when the environment permits) and falls back to seeded random
weights in zero-egress environments (smoke mode, loudly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.zoo import available_models, resolve
from ovmr_tpu.ops.layers import l2_normalize
from ovmr_tpu.text.tokenize_fn import tokenize

__all__ = ["available_models", "load", "tokenize", "CLIPModel"]


class CLIPModel:
    """Functional stand-in for the reference ``CLIP`` nn.Module: params +
    config plus jitted encode/logit methods with the shipped TPU fast
    path (fused Pallas blocks on TPU, XLA elsewhere)."""

    def __init__(self, params, cfg: jclip.CLIPConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        self.params = jclip.cast_params(
            jax.tree_util.tree_map(jnp.asarray, params), dtype
        )
        block_fn = None
        if jax.default_backend() == "tpu" and dtype != jnp.float16:
            from ovmr_tpu.ops.block_fused import fused_residual_block

            block_fn = fused_residual_block
        self._encode_image = jax.jit(
            lambda p, x: jclip.encode_image(p, cfg, x, block_fn=block_fn)
        )
        self._encode_text = jax.jit(
            lambda p, t: jclip.encode_text(p, cfg, t, block_fn=block_fn)
        )

        # one program for the contrastive forward (each extra dispatch costs
        # ~30 ms through this platform's relay): fused-path clip_forward
        # with fp32 logits
        def forward(p, x, t):
            img = l2_normalize(
                jclip.encode_image(p, cfg, x, block_fn=block_fn)
            ).astype(jnp.float32)
            txt = l2_normalize(
                jclip.encode_text(p, cfg, t, block_fn=block_fn)
            ).astype(jnp.float32)
            scale = jnp.exp(p["logit_scale"]).astype(jnp.float32)
            lpi = scale * img @ txt.T
            return lpi, lpi.T

        self._forward = jax.jit(forward)

    @property
    def logit_scale(self):
        return self.params["logit_scale"]

    def encode_image(self, images) -> jax.Array:
        """images [B, 3, H, W] (CHW float, preprocess output) -> [B, D]."""
        return self._encode_image(
            self.params, jnp.asarray(images, self.dtype)
        )

    def encode_text(self, tokens) -> jax.Array:
        """tokens [B, 77] int -> [B, D]."""
        return self._encode_text(self.params, jnp.asarray(tokens))

    def __call__(self, images, tokens) -> Tuple[jax.Array, jax.Array]:
        """(logits_per_image [B, N], logits_per_text [N, B]) — the
        reference ``CLIP.forward`` contract (L2-normalize both sides,
        scale by exp(logit_scale)), one compiled program."""
        return self._forward(
            self.params, jnp.asarray(images, self.dtype), jnp.asarray(tokens)
        )


def _preprocess(resolution: int):
    """The published CLIP eval transform (resize shorter side -> center
    crop -> CLIP-normalized CHW float32), PIL-bicubic-faithful."""
    from PIL import Image

    from ovmr_tpu.data.transforms import (
        BICUBIC,
        CLIP_MEAN,
        CLIP_STD,
        center_crop,
        normalize,
        resize_smaller_edge,
        to_chw_float,
    )

    def fn(img: "Image.Image") -> np.ndarray:
        img = resize_smaller_edge(img.convert("RGB"), resolution, BICUBIC)
        img = center_crop(img, (resolution, resolution))
        return normalize(to_chw_float(img), CLIP_MEAN, CLIP_STD)

    return fn


def load(
    name: str,
    download_root: Optional[str] = None,
    dtype=jnp.bfloat16,
    seed: int = 0,
):
    """Returns ``(CLIPModel, preprocess)`` for a zoo name or checkpoint
    path (reference ``clip.load``; the torch-only ``device``/``jit`` args
    have no JAX equivalent and are intentionally absent)."""
    import os.path as osp

    fname = osp.expanduser(name)
    path = fname if osp.isfile(fname) else resolve(name, download_root)
    if path is not None:
        from ovmr_tpu.models.import_torch import load_clip

        params, cfg = load_clip(path)
    else:
        if name not in jclip.CONFIGS:
            raise KeyError(
                f"unknown model {name!r}; available: {available_models()}"
            )
        print(
            f"WARNING: no local checkpoint for {name}; using RANDOM "
            "weights (smoke-run mode)"
        )
        cfg = jclip.CONFIGS[name]
        params = jclip.init_params(jax.random.PRNGKey(seed), cfg)
    model = CLIPModel(params, cfg, dtype=dtype)
    return model, _preprocess(cfg.image_resolution)
