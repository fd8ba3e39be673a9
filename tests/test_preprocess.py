"""On-device preprocessing vs the host PIL path (geometry + normalization)."""

import numpy as np

import jax.numpy as jnp

from ovmr_tpu.ops.preprocess import preprocess_batch


def test_preprocess_shapes_and_range():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, size=(4, 240, 320, 3), dtype=np.uint8)
    out = preprocess_batch(jnp.asarray(imgs), size=224, out_dtype=jnp.float32)
    assert out.shape == (4, 3, 224, 224)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # CLIP normalization bounds: (0-mean)/std .. (1-mean)/std
    assert arr.min() > -2.5 and arr.max() < 3.0


def test_preprocess_close_to_host_path():
    """Bilinear device resize vs PIL bilinear host resize on a smooth image:
    same geometry, close values (different resamplers -> small tolerance)."""
    from PIL import Image

    from ovmr_tpu.data.transforms import (
        CLIP_MEAN, CLIP_STD, center_crop, normalize, resize_smaller_edge, to_chw_float,
    )

    yy, xx = np.mgrid[0:240, 0:320] / 320.0
    smooth = np.stack([yy, xx, (yy + xx) / 2], -1)
    img_u8 = (smooth * 255).astype(np.uint8)

    dev = np.asarray(
        preprocess_batch(
            jnp.asarray(img_u8[None]), size=224, method="bilinear",
            out_dtype=jnp.float32,
        )
    )[0]

    pil = Image.fromarray(img_u8)
    host = resize_smaller_edge(pil, 224, Image.BILINEAR)
    host = center_crop(host, (224, 224))
    host_arr = normalize(to_chw_float(host), CLIP_MEAN, CLIP_STD)

    diff = np.abs(dev - host_arr)
    assert diff.mean() < 0.05, diff.mean()
