"""Seed determinism: two trainers with identical cfg produce identical
sampler order, split points, and first-step losses."""

import os

import numpy as np

from ovmr_tpu.utils.defaults import get_cfg_default


def _cfg(tmp, tag):
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / f"out_{tag}")
    c.SEED = 3
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
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
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


def test_same_seed_same_losses(tmp_path):
    from ovmr_tpu.engine.trainer import build_trainer

    losses = []
    for tag in ("a", "b"):
        t = build_trainer(_cfg(tmp_path, tag))
        run = []
        t.epoch = 0
        t.before_epoch()
        for i, batch in enumerate(t.train_loader):
            out = t.forward_backward(batch)
            run.append(out["loss"])
            if i >= 1:
                break
        losses.append(run)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_sampler_seed_stability():
    from ovmr_tpu.data import Datum
    from ovmr_tpu.data.samplers import build_sampler

    items = [
        Datum(impath=f"/x/{c}_{i}", label=c, classname=str(c))
        for c in range(4)
        for i in range(6)
    ]
    s = build_sampler("RandomClassSampler", items, batch_size=8, n_ins=2)
    a = s.epoch_indices(np.random.default_rng(5))
    b = s.epoch_indices(np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
