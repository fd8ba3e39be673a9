"""MM_CLS_OP on a multi-device mesh: train batches and eval feature batches
shard over the 'data' axis (8 virtual CPU devices)."""

import os

import numpy as np
import pytest

import jax

from ovmr_tpu.utils.defaults import get_cfg_default


def test_trainer_uses_mesh(tmp_path):
    assert jax.device_count() == 8

    from ovmr_tpu.engine.trainer import build_trainer

    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp_path / "out")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp_path / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    # 8 classes x 4 instances -> num_cls == 8 == mesh size: shardable
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 32
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16  # divisible by 8
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)

    t = build_trainer(c)
    assert t.mesh is not None
    assert t.mesh.devices.size == 8

    t.train()
    acc = t.test()
    assert np.isfinite(acc) and 0.0 <= acc <= 100.0
