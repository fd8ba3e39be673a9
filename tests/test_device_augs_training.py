"""Device-augmented training path: uint8 cache -> in-step augmentation."""

import os

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def test_device_augs_training(tmp_path):
    from ovmr_tpu.engine.trainer import build_trainer

    os.environ["OVMR_CACHE_DIR"] = str(tmp_path / "cache")
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp_path / "out")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp_path / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = [
        "random_resized_crop", "random_flip", "colorjitter",
        "gaussian_noise", "normalize",
    ]
    c.INPUT.RRCROP_SCALE = (0.25, 1.0)
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    c.TPU.DEVICE_AUGS = True
    c.TPU.CACHE_SIDE = 40
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)

    t = build_trainer(c)
    loader = t.train_loader
    batch = next(iter(loader))
    assert batch["img_u8"].dtype == np.uint8
    assert batch["img_u8"].shape == (16, 40, 40, 3)

    before = np.asarray(t.agg_params["cls_token"]).copy()
    t.train()
    after = np.asarray(t.agg_params["cls_token"])
    assert not np.allclose(before, after)
