"""Two-stage chain: MM_CLS_OP classifier generation exports visual_tokens.pt
which the CoOp (OVMR†) trainer loads as frozen vokens."""

import os
import os.path as osp

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def _base(tmp, name):
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / name)
    c.SEED = 1
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.TEST.N_INS = 4
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


def test_stage1_to_stage2(tmp_path):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()

    # stage 1: generate + export vokens
    c1 = _base(tmp_path, "stage1")
    c1.TRAINER.NAME = "MM_CLS_OP"
    c1.TRAINER.COCOOP.N_CTX = 2
    c1.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    t1 = build_trainer(c1)
    t1.generate_classifiers()
    vt_path = osp.join(c1.OUTPUT_DIR, "visual_tokens.pt")
    assert osp.exists(vt_path)

    # stage 2: CoOp with the frozen stage-1 vokens
    c2 = _base(tmp_path, "stage2")
    c2.TRAINER.NAME = "CoOp"
    c2.TRAINER.COOP.N_CTX = 2
    c2.TRAINER.COOP.VISUAL_TOKEN_PATH = vt_path
    c2.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    t2 = build_trainer(c2)
    assert t2.visual_tokens.shape == (8, 2, t2.clip_cfg.embed_dim)
    # vokens match the stage-1 export
    import torch

    vt = torch.load(vt_path, weights_only=False)["visual_tokens"]
    np.testing.assert_allclose(
        np.asarray(t2.visual_tokens), np.asarray(vt.float()), atol=1e-6
    )

    t2.train()
    acc = t2.test()
    assert 0.0 <= acc <= 100.0
