"""Multi-resolution batch collate (reference
``Dassl.pytorch/dassl/data/data_manager.py:15-67``,
``RandomAspectRatioCropResize`` + ``collate_fn_custom`` — defined there
but never wired to any DataLoader; rebuilt here as a live, opt-in
batch transform, ``DATALOADER.MULTI_RES_COLLATE True``).

Per BATCH (not per image) it draws one aspect ratio and one short-side
size, center-crops every image to that ratio, bilinear-resizes to the
patch-multiple target, applies one batch-level horizontal-flip coin, and
normalizes. The reference's dim math is kept exactly:

- ``short_size`` from {112, 224, 336, 448, 560, 672}, floored to the
  patch multiple (identity for p in {14, 16}, where the reference grid
  already divides; p=32 floors 112/336/560 so BOTH axes stay exact
  patch multiples — no pixel band is dropped by the stride-p patchify);
- ratio > 1: height = short_size, width = int((height*ratio // p) * p);
  ratio <= 1: width = short_size, height = int((width/ratio // p) * p)
  with patch size p = 14;
- crop: if ``orig_w/orig_h > ratio`` the width shrinks to
  ``int(orig_h * ratio)``, else the height shrinks to
  ``int(orig_w / ratio)`` (PIL center crop, same as torchvision's
  ``F.center_crop`` on PIL input);
- the reference stacks tensors then applies ``T.RandomHorizontalFlip()``
  and ``T.ColorJitter()`` to the 4-D batch: ONE flip coin for the whole
  batch, and an argless ColorJitter is the identity transform — both
  behaviors reproduced (the jitter as a documented no-op).

TPU-first deviation (documented): the reference draws the ratio from the
continuous ``uniform(1/2, 2)``. Every distinct (H, W) is a separate XLA
compilation, so the continuous draw creates an unbounded shape set; here
the ratio comes from a log-uniform GRID (default 9 bins over [1/2, 2]),
bounding the shape set to ``len(grid) * len(short_sizes)`` programs while
covering the same range. ``ratio_bins=0`` restores the continuous draw.

Consumption: the ViT towers accept these off-native batches — the
positional-embedding table bilinear-resizes to the batch's patch grid
(``models/clip.py::resize_pos_embed``, identity at the native size), so
`DATALOADER.MULTI_RES_COLLATE True` trains end-to-end through the real
step (`tests/test_multires.py` pins an MM_CLS_OP forward_backward).
The reference could not do this (its collate was never wired, and its
tower has no resolution adaptation). Fixed-FC convnet backbones (the
Dassl digit CNNs) cannot consume variable sizes — same as upstream torch.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np
from PIL import Image

# CLIP normalization constants (reference collate hard-codes them)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class MultiResCollate:
    """Batch-level random-aspect-ratio crop/resize collate."""

    # batch-level: the loader draws ONE rng per batch and hands it in
    stochastic = True

    def __init__(
        self,
        patch_size: int = 14,
        short_sizes: Sequence[int] = (112, 224, 336, 448, 560, 672),
        ratio_range: tuple = (0.5, 2.0),
        ratio_bins: int = 9,
        mean: Sequence[float] = CLIP_MEAN,
        std: Sequence[float] = CLIP_STD,
        flip_p: float = 0.5,
    ):
        self.patch_size = patch_size
        # the SHORT side also feeds the stride-p patchify, so it must be a
        # patch multiple too (the reference 112-grid divides p in {14,16}
        # and passes through unchanged there; p=32 floors 112->96 etc. so
        # no pixel band is silently dropped by the patch embed)
        self.short_sizes = tuple(
            sorted({max(patch_size, (s // patch_size) * patch_size) for s in short_sizes})
        )
        self.ratio_range = ratio_range
        # log-uniform grid so 1/r appears whenever r does (2:1 and 1:2
        # crops are equally likely, like the continuous draw)
        if not ratio_bins:
            self.ratio_grid = None
        elif ratio_bins == 1:
            # single bin: the geometric mid of the range (1.0 for [1/2, 2])
            self.ratio_grid = (math.sqrt(ratio_range[0] * ratio_range[1]),)
        else:
            self.ratio_grid = tuple(
                math.exp(
                    math.log(ratio_range[0])
                    + (math.log(ratio_range[1]) - math.log(ratio_range[0]))
                    * i
                    / (ratio_bins - 1)
                )
                for i in range(ratio_bins)
            )
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)
        self.flip_p = flip_p

    def draw_shape(self, rng: random.Random):
        """One (ratio, resized_h, resized_w) draw for a batch — the
        reference dim math on the (gridded) ratio."""
        if self.ratio_grid is not None:
            ratio = rng.choice(self.ratio_grid)
        else:
            ratio = rng.uniform(*self.ratio_range)
        short = rng.choice(self.short_sizes)
        p = self.patch_size
        if ratio > 1:
            h = short
            w = int((h * ratio // p) * p)
        else:
            w = short
            h = int((w / ratio // p) * p)
        return ratio, h, w

    def _crop_resize(self, img: Image.Image, ratio: float, h: int, w: int):
        ow, oh = img.size
        if ow / oh > ratio:
            tw, th = int(oh * ratio), oh
        else:
            tw, th = ow, int(ow / ratio)
        # PIL center crop (torchvision F.center_crop semantics on PIL)
        left = int(round((ow - tw) / 2.0))
        top = int(round((oh - th) / 2.0))
        img = img.crop((left, top, left + tw, top + th))
        img = img.resize((w, h), Image.BILINEAR)
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        return arr

    def __call__(self, images, rng: random.Random) -> np.ndarray:
        """Collate a list of PIL images into one normalized [B,3,H,W]
        float32 batch at a single per-batch shape."""
        ratio, h, w = self.draw_shape(rng)
        batch = np.stack(
            [self._crop_resize(img, ratio, h, w) for img in images]
        )
        if rng.random() < self.flip_p:  # ONE coin for the whole batch
            batch = batch[..., ::-1]
        # reference ColorJitter() has no arguments -> identity; omitted
        batch = (batch - self.mean) / self.std
        return np.ascontiguousarray(batch, np.float32)
