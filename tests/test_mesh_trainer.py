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


def test_sharded_generation_matches_single_device(tmp_path):
    """Classifier generation sharded over 'data' (class-axis shard_map)
    produces the same classifiers as the single-device program."""
    import copy

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
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 32
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.TEST.N_INS = 4
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)

    c1 = copy.deepcopy(c)
    c1.TPU.MESH.DATA = 1  # single-program reference
    t1 = build_trainer(c1)
    assert t1.mesh is None
    ref = t1.generate_classifiers()

    t8 = build_trainer(c)
    assert t8.mesh is not None and t8.mesh.devices.size == 8
    # identical init (same seed), different placement
    got = t8.generate_classifiers()

    for k in ("mm_classifier", "vision_classifier", "text_classifier",
              "fusion_weight"):
        np.testing.assert_allclose(got[k], ref[k], atol=2e-5, err_msg=k)
