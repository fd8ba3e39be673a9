"""Feature-interaction stress: device augs + mesh + uint8 eval + int8 serving
all active in one trainer run."""

import os

import numpy as np
import pytest

import jax

from ovmr_tpu.utils.defaults import get_cfg_default


def test_all_tpu_features_together(tmp_path):
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
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 32  # 8 classes == 8 devices: shardable
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 2
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    c.TPU.DEVICE_AUGS = True
    c.TPU.CACHE_SIDE = 40
    c.TPU.INT8 = True
    c.EVAL_MODE = "fusion"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)

    t = build_trainer(c)
    assert t.mesh is not None and t.mesh.devices.size == 8
    before = np.asarray(t.agg_params["cls_token"]).copy()
    t.train()  # 2 epochs, cached uint8 batches, in-step augs, sharded
    assert not np.allclose(before, np.asarray(t.agg_params["cls_token"]))

    acc = t.test()  # uint8 eval transfer + int8 serving towers + fusion
    assert 0.0 <= acc <= 100.0
    assert os.path.exists(os.path.join(t.output_dir, "mm_classifiers.pt"))
