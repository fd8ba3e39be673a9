"""On-device fused image preprocessing.

The host PIL pipeline (:mod:`ovmr_tpu.data.transforms`) is the
parity-faithful path; this module is the speed-of-light eval path from the
BASELINE north star: uint8 HWC batches stream to HBM and one XLA program
fuses resize (bilinear/bicubic via jax.image), center-crop, scale-to-[0,1],
CLIP normalization and the NCHW transpose into the encoder's input.

Intended use: eval/serving where thousands of images/sec must feed the MXU
without a host bottleneck (decode stays on host; everything after is fused
into the encode program).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@partial(jax.jit, static_argnames=("mean", "std", "out_dtype"))
def normalize_u8(
    images_u8: jax.Array,
    mean: Tuple[float, float, float] = CLIP_MEAN,
    std: Tuple[float, float, float] = CLIP_STD,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8 [B, H, W, 3] (already resized/cropped on host) -> normalized
    NHWC float. Lets eval ship uint8 over the host->device link (4x smaller
    than f32) and is bit-identical to the host ToTensor+Normalize path."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(out_dtype)


@partial(jax.jit, static_argnames=("size", "method", "out_dtype"))
def preprocess_batch(
    images_u8: jax.Array,
    size: int = 224,
    method: str = "bicubic",
    mean: Tuple[float, float, float] = CLIP_MEAN,
    std: Tuple[float, float, float] = CLIP_STD,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8 [B, H, W, 3] -> normalized [B, 3, size, size] in `out_dtype`.

    Resizes the smaller edge to `size` (aspect preserved via a single
    resize to the scaled shape) then center-crops — the same geometry as
    the test transform (reference ``transforms.py:495-526``).
    """
    b, h, w, c = images_u8.shape
    x = images_u8.astype(jnp.float32) / 255.0

    # static smaller-edge resize geometry
    if h <= w:
        nh, nw = size, max(int(round(w * size / h)), size)
    else:
        nh, nw = max(int(round(h * size / w)), size), size
    x = jax.image.resize(x, (b, nh, nw, c), method=method)

    top = int(round((nh - size) / 2.0))
    left = int(round((nw - size) / 2.0))
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, size, size, c)
    )

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    x = (x - mean_a) / std_a
    return x.transpose(0, 3, 1, 2).astype(out_dtype)
