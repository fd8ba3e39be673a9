"""Multi-resolution batch collate (reference data_manager.py:15-67,
``RandomAspectRatioCropResize`` + ``collate_fn_custom`` — dead there,
live + opt-in here via ``DATALOADER.MULTI_RES_COLLATE``)."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.data.multires import CLIP_MEAN, CLIP_STD, MultiResCollate


def make_images(n, sizes):
    rng = np.random.RandomState(0)
    return [
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        for (w, h) in sizes[:n]
    ]


def test_dim_math_matches_reference_formula():
    """The (ratio, short) -> (H, W) map is the reference's exactly:
    ratio>1: H=short, W=int((H*ratio//14)*14); ratio<=1: W=short,
    H=int((W/ratio//14)*14)."""
    mc = MultiResCollate()
    for _ in range(200):
        rng = random.Random(_)
        ratio, h, w = mc.draw_shape(rng)
        assert h % 14 == 0 and w % 14 == 0
        if ratio > 1:
            assert h in mc.short_sizes
            assert w == int((h * ratio // 14) * 14)
        else:
            assert w in mc.short_sizes
            assert h == int((w / ratio // 14) * 14)


def test_ratio_grid_is_log_symmetric_and_optional():
    mc = MultiResCollate(ratio_bins=9)
    grid = np.asarray(mc.ratio_grid)
    assert grid[0] == pytest.approx(0.5) and grid[-1] == pytest.approx(2.0)
    # log-uniform: 1/r mirrors r
    np.testing.assert_allclose(grid, 1.0 / grid[::-1], rtol=1e-12)
    # ratio_bins=0 restores the reference's continuous draw
    mc0 = MultiResCollate(ratio_bins=0)
    assert mc0.ratio_grid is None
    draws = {mc0.draw_shape(random.Random(i))[0] for i in range(50)}
    assert len(draws) == 50  # continuous


def test_single_ratio_bin_and_patch32_short_floor():
    """ratio_bins=1 is the geometric mid of the range (1.0 for [1/2,2]),
    and the SHORT side floors to the backbone patch multiple too (p=32:
    112->96, 336->320, 560->544) so the stride-p patchify never drops a
    pixel band on either axis."""
    mc1 = MultiResCollate(ratio_bins=1)
    assert mc1.ratio_grid == (pytest.approx(1.0),)
    ratio, h, w = mc1.draw_shape(random.Random(0))
    assert ratio == pytest.approx(1.0)

    mc32 = MultiResCollate(patch_size=32)
    assert mc32.short_sizes == (96, 224, 320, 448, 544, 672)
    for seed in range(100):
        _, h, w = mc32.draw_shape(random.Random(seed))
        assert h % 32 == 0 and w % 32 == 0


def test_collate_batch_shape_flip_and_normalization():
    """One shape per batch; the flip is ONE coin for the whole batch; the
    normalization is (x/255 - mean)/std on the PIL crop+bilinear-resize."""
    images = make_images(4, [(64, 48), (80, 80), (48, 64), (100, 40)])
    mc = MultiResCollate()

    batch = mc(images, random.Random(0))
    assert batch.dtype == np.float32
    b, c, h, w = batch.shape
    assert (b, c) == (4, 3) and h % 14 == 0 and w % 14 == 0

    # find one seed that flips and one that doesn't, same (ratio, short)
    def raw(seed, flip_p):
        m = MultiResCollate(flip_p=flip_p)
        return m(images, random.Random(seed))

    no_flip = raw(0, 0.0)
    flipped = MultiResCollate(flip_p=1.0)(images, random.Random(0))
    np.testing.assert_array_equal(flipped, no_flip[..., ::-1])

    # normalization: undo it and compare to the raw crop+resize
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(3, 1, 1)
    ratio, hh, ww = mc.draw_shape(random.Random(0))
    manual = mc._crop_resize(images[0], ratio, hh, ww)
    np.testing.assert_allclose(
        no_flip[0] * std + mean, manual, atol=1e-6
    )


def test_crop_matches_reference_center_crop_semantics():
    """Wide image + ratio 1: the crop takes the center square of height
    `oh` (reference: target_width=int(oh*ratio) when ow/oh > ratio)."""
    arr = np.zeros((28, 84, 3), np.uint8)
    arr[:, 28:56] = 255  # center band
    img = Image.fromarray(arr)
    mc = MultiResCollate()
    out = mc._crop_resize(img, 1.0, 28, 28)
    assert out.shape == (3, 28, 28)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)  # pure center band


def test_determinism_and_seed_sensitivity():
    images = make_images(3, [(64, 48), (80, 80), (48, 64)])
    mc = MultiResCollate()
    a = mc(images, random.Random(7))
    b = mc(images, random.Random(7))
    np.testing.assert_array_equal(a, b)
    c = mc(images, random.Random(8))
    assert a.shape != c.shape or not np.array_equal(a, c)


def test_loader_surface_and_incompatibilities(tmp_path):
    """DATALOADER.MULTI_RES_COLLATE True drives the real DataManager train
    loader: raw decode + one per-batch shape; combining with K_TRANSFORMS
    raises."""
    from ovmr_tpu.data.manager import DataManager
    from ovmr_tpu.utils.defaults import get_cfg_default

    os.environ["OVMR_SYNTHETIC"] = "4,6,48"
    try:
        cfg = get_cfg_default()
        cfg.DATASET.NAME = "Synthetic"
        cfg.DATASET.ROOT = str(tmp_path / "data")
        cfg.DATASET.NUM_SHOTS = 4
        cfg.SEED = 1
        cfg.INPUT.SIZE = (32, 32)
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
        cfg.DATALOADER.NUM_WORKERS = 2
        cfg.DATALOADER.MULTI_RES_COLLATE = True
        cfg.freeze()
        dm = DataManager(cfg)
        batch = next(iter(dm.train_loader_x))
        b, c, h, w = batch["img"].shape
        assert b == 8 and c == 3
        assert h % 14 == 0 and w % 14 == 0
        # multi-res ignores INPUT.SIZE — the shape comes from the grid
        assert (h, w) != (32, 32)
        assert batch["label"].shape == (8,)
        # same epoch stream -> same per-batch shape draw across loaders
        dm2 = DataManager(cfg)
        batch2 = next(iter(dm2.train_loader_x))
        np.testing.assert_array_equal(batch["img"], batch2["img"])

        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.DATALOADER.K_TRANSFORMS = 2
        cfg2.freeze()
        with pytest.raises(ValueError, match="MULTI_RES_COLLATE"):
            DataManager(cfg2)
    finally:
        os.environ.pop("OVMR_SYNTHETIC", None)


def test_resize_pos_embed_identity_and_offnative():
    import jax
    import jax.numpy as jnp

    from ovmr_tpu.models.clip import resize_pos_embed

    pe = jax.random.normal(jax.random.PRNGKey(0), (1 + 4, 16))  # grid 2
    # native: the SAME array object (identity path, bit-exact by construction)
    assert resize_pos_embed(pe, 2, 2, 2) is pe
    out = resize_pos_embed(pe, 2, 3, 5)
    assert out.shape == (1 + 15, 16)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(pe[0]))
    assert np.isfinite(np.asarray(out)).all()
    # constant table stays constant under bilinear resize
    const = jnp.ones((1 + 4, 8))
    np.testing.assert_allclose(
        np.asarray(resize_pos_embed(const, 2, 4, 6)), 1.0, atol=1e-6
    )


def test_encode_image_consumes_offnative_sizes():
    """The ViT tower accepts a non-native (even non-square) input: the
    pos table bilinear-resizes to the batch's patch grid."""
    import jax

    from ovmr_tpu.models import clip as jclip

    params = jclip.init_params(jax.random.PRNGKey(0), jclip.TINY)
    imgs = np.random.RandomState(0).randn(2, 3, 32, 64).astype(np.float32)
    feats = jclip.encode_image(params, jclip.TINY, imgs)  # grid 2x4
    assert feats.shape == (2, jclip.TINY.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_multires_trains_through_the_real_step(tmp_path):
    """DATALOADER.MULTI_RES_COLLATE feeds the REAL MM_CLS_OP train step:
    a variable-resolution batch (per-batch shape from the grid, patch
    size derived from the backbone) produces a finite loss through
    forward_backward — the end-to-end consumption the reference's
    never-wired collate could not offer."""
    from ovmr_tpu.engine.trainer import build_trainer
    from ovmr_tpu.utils.defaults import get_cfg_default

    os.environ["OVMR_SYNTHETIC"] = "4,8,48"
    try:
        c = get_cfg_default()
        c.TRAINER.NAME = "MM_CLS_OP"
        c.DATASET.NAME = "Synthetic"
        c.DATASET.NUM_SHOTS = 4
        c.DATASET.ROOT = str(tmp_path / "data")
        c.OUTPUT_DIR = str(tmp_path / "out")
        c.SEED = 1
        c.INPUT.SIZE = (32, 32)
        c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
        c.DATALOADER.TRAIN_X.BATCH_SIZE = 8
        c.DATALOADER.TRAIN_X.N_INS = 4
        c.DATALOADER.TEST.BATCH_SIZE = 8
        c.DATALOADER.NUM_WORKERS = 2
        c.DATALOADER.MULTI_RES_COLLATE = True
        c.MODEL.BACKBONE.NAME = "TINY"
        c.OPTIM.MAX_EPOCH = 1
        c.TRAINER.COCOOP.N_CTX = 2
        c.TPU.DTYPE = "float32"
        c.freeze()
        t = build_trainer(c)
        batch = next(iter(t.train_loader))
        b, ch, h, w = batch["img"].shape
        assert (h, w) != (32, 32) and h % 16 == 0 and w % 16 == 0
        metrics = t.forward_backward(batch)
        assert np.isfinite(metrics["loss"])
    finally:
        os.environ.pop("OVMR_SYNTHETIC", None)


def test_resnet_attention_pool_offnative():
    """The ModifiedResNet AttentionPool2d also adapts off-native feature
    grids (bilinear-resized positional table; identity at native size —
    native parity is pinned by test_resnet_parity.py goldens)."""
    import jax

    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.models.resnet import encode_image_resnet

    params = jclip.init_params(jax.random.PRNGKey(0), jclip.TINY_RN)
    imgs = np.random.RandomState(0).randn(2, 3, 96, 64).astype(np.float32)
    feats = encode_image_resnet(params, imgs, jclip.TINY_RN.vision_heads)
    assert feats.shape == (2, jclip.TINY_RN.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()

    # equal-area NON-square (4x1 map vs the trained 2x2): the guard keys
    # on grid shape, so the table resizes instead of being silently
    # reused row-major
    tall = np.random.RandomState(1).randn(2, 3, 128, 32).astype(np.float32)
    feats2 = encode_image_resnet(params, tall, jclip.TINY_RN.vision_heads)
    assert feats2.shape == (2, jclip.TINY_RN.embed_dim)
    assert np.isfinite(np.asarray(feats2)).all()
