"""Device augmentation pipeline + uint8 cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.ops.augment import augment_batch, _bilinear_crop


def test_augment_shapes_and_stats():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    out = augment_batch(
        jnp.asarray(imgs), jax.random.PRNGKey(0), out_size=32,
        out_dtype=jnp.float32,
    )
    assert out.shape == (8, 3, 32, 32)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # noise can push slightly outside the pure-normalization range
    assert arr.min() > -4.0 and arr.max() < 5.0


def test_augment_randomness_and_determinism():
    imgs = jnp.asarray(np.random.RandomState(1).randint(0, 255, (4, 64, 64, 3), np.uint8))
    a = augment_batch(imgs, jax.random.PRNGKey(0), out_size=32, out_dtype=jnp.float32)
    b = augment_batch(imgs, jax.random.PRNGKey(0), out_size=32, out_dtype=jnp.float32)
    c = augment_batch(imgs, jax.random.PRNGKey(1), out_size=32, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_bilinear_crop_identity():
    """Full-frame box with matching output size reproduces the input."""
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    out = _bilinear_crop(
        jnp.asarray(img),
        x0=jnp.zeros(2), y0=jnp.zeros(2),
        cw=jnp.full(2, 16.0), ch=jnp.full(2, 16.0),
        out_size=16,
    )
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_bilinear_crop_subregion():
    """An aligned integer sub-box at native resolution equals a slice."""
    rng = np.random.RandomState(2)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    out = _bilinear_crop(
        jnp.asarray(img),
        x0=jnp.asarray([4.0]), y0=jnp.asarray([2.0]),
        cw=jnp.asarray([8.0]), ch=jnp.asarray([8.0]),
        out_size=8,
    )
    np.testing.assert_allclose(np.asarray(out)[0], img[0, 2:10, 4:12], atol=1e-5)


def test_image_cache_and_loader(tmp_path):
    from ovmr_tpu.data.cache import CachedClassBatchLoader, ImageArrayCache
    from ovmr_tpu.data.samplers import build_sampler
    from ovmr_tpu.data.datasets.synthetic import Synthetic
    from ovmr_tpu.utils.defaults import get_cfg_default

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_SHOTS = 4
    ds = Synthetic(cfg, num_classes=4, per_class=8, size=48)

    cache = ImageArrayCache(ds.train_x, side=32, cache_dir=str(tmp_path / "cache"))
    assert cache.images.shape == (len(ds.train_x), 32, 32, 3)

    sampler = build_sampler("RandomClassSampler", ds.train_x, batch_size=8, n_ins=4)
    loader = CachedClassBatchLoader(cache, sampler, batch_size=8, seed=0)
    batch = next(iter(loader))
    assert batch["img_u8"].shape == (8, 32, 32, 3)
    assert batch["img_u8"].dtype == np.uint8
    labels = batch["label"].reshape(2, 4)
    assert (labels == labels[:, :1]).all()

    # second construction hits the cache file
    cache2 = ImageArrayCache(ds.train_x, side=32, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(cache2.images[0]), np.asarray(cache.images[0]))


def test_matmul_crop_matches_gather():
    """The MXU matmul crop (fp32) equals the 4-corner gather bilinear crop."""
    from ovmr_tpu.ops.augment import _matmul_crop

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (4, 24, 24, 3), np.uint8)
    x0 = jnp.asarray([0.0, 3.2, 5.5, 1.7])
    y0 = jnp.asarray([2.0, 0.0, 4.4, 6.1])
    cw = jnp.asarray([24.0, 17.3, 12.8, 20.0])
    ch = jnp.asarray([20.0, 24.0, 15.5, 18.2])
    ref = _bilinear_crop(jnp.asarray(img), x0, y0, cw, ch, out_size=16)
    got = _matmul_crop(
        jnp.asarray(img), x0, y0, cw, ch, out_size=16, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_matmul_crop_flip_folding():
    """flip=True equals mirroring the unflipped crop output."""
    from ovmr_tpu.ops.augment import _matmul_crop

    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (2, 24, 24, 3), np.uint8)
    x0 = jnp.asarray([2.0, 4.0])
    y0 = jnp.asarray([1.0, 3.0])
    cw = jnp.asarray([18.0, 14.0])
    ch = jnp.asarray([18.0, 16.0])
    plain = _matmul_crop(
        jnp.asarray(img), x0, y0, cw, ch, 16,
        flip=jnp.asarray([False, False]), dtype=jnp.float32,
    )
    flipped = _matmul_crop(
        jnp.asarray(img), x0, y0, cw, ch, 16,
        flip=jnp.asarray([True, True]), dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(flipped), np.asarray(plain)[:, :, ::-1, :], atol=1e-4
    )


def test_matmul_crop_bf16_close_to_fp32():
    """bf16 matmul path stays within ~one grey level of fp32."""
    from ovmr_tpu.ops.augment import _matmul_crop

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    x0 = jnp.asarray([1.5, 2.5]); y0 = jnp.asarray([0.5, 3.0])
    cw = jnp.asarray([28.0, 20.0]); ch = jnp.asarray([24.0, 26.0])
    f32 = _matmul_crop(jnp.asarray(img), x0, y0, cw, ch, 16, dtype=jnp.float32)
    b16 = _matmul_crop(jnp.asarray(img), x0, y0, cw, ch, 16, dtype=jnp.bfloat16)
    assert float(jnp.abs(f32 - b16).max()) < 2.0
