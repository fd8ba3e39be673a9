"""On-device training augmentations.

TPU-native replacement for the host PIL train pipeline
(:mod:`ovmr_tpu.data.transforms`): the host streams cached uint8 images
(decode-once cache, :mod:`ovmr_tpu.data.cache`) and the device performs the
whole OVMR augmentation recipe inside the training program —
random-resized-crop, horizontal flip, color jitter, CLIP normalization and
gaussian noise. This removes the host decode/augment bottleneck (this host
has ONE cpu core; PIL tops out ~200 img/s while the chip consumes ~2000).

Aug semantics are distributionally equivalent to torchvision's (same
parameter ranges; bilinear resampling; hue implemented as a YIQ-plane
rotation instead of an HSV round-trip).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _sample_crop_boxes(rng, batch, in_size, scale, ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Sample torchvision-style RRC boxes; one rejection round vectorized
    over 10 candidate draws per image, fall back to the full frame."""
    k_area, k_ratio, k_x, k_y, k_pick = jax.random.split(rng, 5)
    tries = 10
    area = in_size * in_size
    target_area = area * jax.random.uniform(
        k_area, (batch, tries), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio,
        (batch, tries),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_r)
    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    valid = (cw <= in_size) & (ch <= in_size)
    # first valid try per image (argmax over bool), else full-frame fallback
    pick = jnp.argmax(valid, axis=1)
    any_valid = valid.any(axis=1)
    sel = lambda m: jnp.take_along_axis(m, pick[:, None], axis=1)[:, 0]
    cw = jnp.where(any_valid, sel(cw), float(in_size))
    ch = jnp.where(any_valid, sel(ch), float(in_size))
    x0 = jax.random.uniform(k_x, (batch,)) * (in_size - cw)
    y0 = jax.random.uniform(k_y, (batch,)) * (in_size - ch)
    return x0, y0, cw, ch


def _bilinear_crop(images, x0, y0, cw, ch, out_size):
    """Per-image crop boxes -> float [B, out, out, 3] via bilinear gather.

    Accepts uint8 input directly: the gathers move 4x less data and the
    float conversion happens on the gathered corners (linear, so identical
    to converting first) — measured 27% faster at batch 1536 x 256²."""
    b, s, _, c = images.shape
    # sample positions follow torchvision/PIL convention: align box corners
    iy = jnp.arange(out_size, dtype=jnp.float32)
    ix = jnp.arange(out_size, dtype=jnp.float32)
    # pixel-center mapping: out pixel i samples y0 + (i + 0.5) * ch/out - 0.5
    ys = y0[:, None] + (iy[None, :] + 0.5) * (ch[:, None] / out_size) - 0.5
    xs = x0[:, None] + (ix[None, :] + 0.5) * (cw[:, None] / out_size) - 0.5
    ys = jnp.clip(ys, 0.0, s - 1.0)
    xs = jnp.clip(xs, 0.0, s - 1.0)

    y0i = jnp.floor(ys).astype(jnp.int32)
    x0i = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, s - 1)
    x1i = jnp.minimum(x0i + 1, s - 1)
    wy = (ys - y0i.astype(jnp.float32))[:, :, None, None]  # [B, out, 1, 1]
    wx = (xs - x0i.astype(jnp.float32))[:, None, :, None]  # [B, 1, out, 1]

    def gather_rows(img_rows, yi):
        # img_rows [B, S, S, C], yi [B, out] -> [B, out, S, C]
        return jnp.take_along_axis(img_rows, yi[:, :, None, None], axis=1)

    top = gather_rows(images, y0i)
    bot = gather_rows(images, y1i)

    def gather_cols(rows, xi):
        # rows [B, out, S, C], xi [B, out] -> [B, out, out, C] (float)
        return jnp.take_along_axis(rows, xi[:, None, :, None], axis=2).astype(
            jnp.float32
        )

    tl = gather_cols(top, x0i)
    tr = gather_cols(top, x1i)
    bl = gather_cols(bot, x0i)
    br = gather_cols(bot, x1i)

    out = (
        tl * (1 - wy) * (1 - wx)
        + tr * (1 - wy) * wx
        + bl * wy * (1 - wx)
        + br * wy * wx
    )
    return out


def _interp_weights(starts, sizes, in_size, out_size):
    """Bilinear interpolation matrices [B, out, in]: row i holds the hat
    weights for output sample i of a (start, size) crop. Exactly the
    two-neighbor floor/ceil weights of :func:`_bilinear_crop` expressed as
    a dense matrix."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    pos = starts[:, None] + (i[None, :] + 0.5) * (sizes[:, None] / out_size) - 0.5
    pos = jnp.clip(pos, 0.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(pos[:, :, None] - j[None, None, :]), 0.0, 1.0)


def _matmul_crop(images, x0, y0, cw, ch, out_size, flip=None, dtype=jnp.bfloat16):
    """Crop + bilinear resize as two batched MXU matmuls (separable
    interpolation): rows then columns. Replaces the 4-corner gather
    (:func:`_bilinear_crop`), which lowers to slow strided gathers on TPU —
    the matmuls run on the MXU at ~250 GFLOP/step for batch 1536, i.e.
    ~2 ms of systolic-array time instead of >100 ms of gather time.

    `flip` [B] bool folds the horizontal flip in for free (reverses the
    output rows of the x-interpolation matrix). uint8 inputs are exactly
    representable in bf16, and accumulation is fp32, so the bf16 path is
    within one grey level of the fp32 gather. Returns fp32 [B, out, out, C].
    """
    b, s, _, c = images.shape
    wy = _interp_weights(y0, ch, s, out_size).astype(dtype)  # [B, out, S]
    wx = _interp_weights(x0, cw, s, out_size)  # [B, out, S]
    if flip is not None:
        wx = jnp.where(flip[:, None, None], wx[:, ::-1, :], wx)
    wx = wx.astype(dtype)
    imgf = images.astype(dtype)
    t = jnp.einsum(
        "bos,bshc->bohc", wy, imgf, preferred_element_type=jnp.float32
    ).astype(dtype)
    return jnp.einsum(
        "bow,bhwc->bhoc", wx, t, preferred_element_type=jnp.float32
    )


def _color_jitter(x, rng, b, c, s, h):
    """torchvision-range brightness/contrast/saturation; hue via YIQ
    rotation. x in [0,1], [B,H,W,3].

    Deviation from torchvision: ops apply in a FIXED order
    (brightness->contrast->saturation->hue) instead of a per-image random
    permutation — per-image op reordering would need 24 traced branches;
    the distributional difference is limited to clipping interactions."""
    kb, kc, ks, kh = jax.random.split(rng, 4)
    batch = x.shape[0]

    fb = jax.random.uniform(kb, (batch, 1, 1, 1), minval=max(0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(kc, (batch, 1, 1, 1), minval=max(0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(ks, (batch, 1, 1, 1), minval=max(0, 1 - s), maxval=1 + s)
    fh = jax.random.uniform(kh, (batch, 1, 1), minval=-h, maxval=h) * 2 * jnp.pi

    gray_w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)

    x = jnp.clip(x * fb, 0.0, 1.0)
    mean_gray = jnp.mean(
        jnp.sum(x * gray_w, axis=-1, keepdims=True), axis=(1, 2), keepdims=True
    )
    x = jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 1.0)
    gray = jnp.sum(x * gray_w, axis=-1, keepdims=True)
    x = jnp.clip((x - gray) * fs + gray, 0.0, 1.0)

    if h > 0:
        # YIQ hue rotation
        rgb2yiq = jnp.asarray(
            [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
            x.dtype,
        )
        yiq2rgb = jnp.asarray(
            [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]],
            x.dtype,
        )
        yiq = jnp.einsum("bhwc,dc->bhwd", x, rgb2yiq)
        cos_h = jnp.cos(fh)[..., None]
        sin_h = jnp.sin(fh)[..., None]
        i = yiq[..., 1:2] * cos_h - yiq[..., 2:3] * sin_h
        q = yiq[..., 1:2] * sin_h + yiq[..., 2:3] * cos_h
        yiq = jnp.concatenate([yiq[..., :1], i, q], axis=-1)
        x = jnp.clip(jnp.einsum("bhwd,cd->bhwc", yiq, yiq2rgb), 0.0, 1.0)
    return x


@partial(
    jax.jit,
    static_argnames=("out_size", "scale", "jitter", "gn_std", "out_dtype", "out_layout"),
)
def augment_batch(
    images_u8: jax.Array,
    rng: jax.Array,
    out_size: int = 224,
    scale: Tuple[float, float] = (0.25, 1.0),
    jitter: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.1),
    gn_std: float = 0.15,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
    out_dtype=jnp.bfloat16,
    out_layout: str = "NCHW",
) -> jax.Array:
    """uint8 [B, S, S, 3] -> augmented, normalized [B, 3, out, out] (NCHW)
    or [B, out, out, 3] (NHWC; skips the final relayout — pair with the
    NHWC encode path)."""
    b, s, _, _ = images_u8.shape
    k_crop, k_flip, k_jit, k_noise, k_noise_p = jax.random.split(rng, 5)

    # crop+resize as batched MXU matmuls, flip folded into the x weights
    # (measured: the 4-corner gather path was the dominant augmentation
    # cost; see _matmul_crop)
    x0, y0, cw, ch = _sample_crop_boxes(k_crop, b, s, scale)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = _matmul_crop(images_u8, x0, y0, cw, ch, out_size, flip=flip) / 255.0

    x = _color_jitter(x, k_jit, *jitter)

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    x = (x - mean_a) / std_a

    if gn_std > 0:
        apply = jax.random.bernoulli(k_noise_p, 0.5, (b, 1, 1, 1))
        noise = jax.random.normal(k_noise, x.shape) * gn_std
        x = x + jnp.where(apply, noise, 0.0)

    if out_layout == "NCHW":
        x = x.transpose(0, 3, 1, 2)
    return x.astype(out_dtype)
