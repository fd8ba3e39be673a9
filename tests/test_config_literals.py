"""Regression: yaml configs with yacs-style tuple/number syntax must parse
into real python values (found by review: the shipped trainer configs were
unusable because "(224, 224)" stayed a raw string)."""

import numpy as np

from ovmr_tpu.utils.defaults import get_cfg_default
import pytest

pytestmark = pytest.mark.quick


def test_shipped_trainer_config_parses():
    cfg = get_cfg_default()
    cfg.merge_from_file(
        "configs/trainers/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain.yaml"
    )
    assert cfg.INPUT.SIZE == (224, 224)
    assert cfg.INPUT.RRCROP_SCALE == (0.25, 1.0)
    assert isinstance(cfg.OPTIM.WARMUP_CONS_LR, float)
    assert cfg.OPTIM.WARMUP_CONS_LR == 1e-5
    assert cfg.INPUT.INTERPOLATION == "bicubic"  # plain strings stay strings
    assert cfg.MODEL.BACKBONE.NAME == "ViT-B/16"
    assert cfg.TRAINER.COCOOP.CTX_INIT == " ?"
    assert cfg.DATALOADER.TRAIN_X.BATCH_SIZE == 1536


def test_every_shipped_config_parses():
    import glob

    for path in glob.glob("configs/**/*.yaml", recursive=True):
        cfg = get_cfg_default()
        cfg.merge_from_file(path)
        size = cfg.INPUT.SIZE
        assert isinstance(size, tuple) and all(isinstance(s, int) for s in size), (
            path, size,
        )


def test_transform_builds_from_shipped_config():
    from PIL import Image

    from ovmr_tpu.data.transforms import build_transform

    cfg = get_cfg_default()
    cfg.merge_from_file(
        "configs/trainers/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain.yaml"
    )
    tr = build_transform(cfg, is_train=True)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(256, 256, 3) * 255).astype(np.uint8)
    )
    out = tr(img)
    assert out.shape == (3, 224, 224)
