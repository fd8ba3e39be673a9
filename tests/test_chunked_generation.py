"""Chunked classifier generation: class count exceeding TPU.CLASS_CHUNK
produces identical classifiers to a single-chunk run."""

import os

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def make_trainer(tmp, chunk, per_class=6, num_classes=12):
    from ovmr_tpu.data.datasets.synthetic import Synthetic
    from ovmr_tpu.engine.trainer import build_trainer

    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / f"out_chunk{chunk}")
    c.SEED = 1
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
    c.TPU.CLASS_CHUNK = chunk
    c.TPU.CLASS_PAD_MULTIPLE = 4
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return build_trainer(c)


def test_multi_chunk_equals_single_chunk(tmp_path):
    # 8 synthetic classes; chunk 4 -> 2 chunks vs chunk 8 -> 1 chunk
    t_multi = make_trainer(tmp_path, chunk=4)
    t_single = make_trainer(tmp_path, chunk=8)
    out_m = t_multi.generate_classifiers()
    out_s = t_single.generate_classifiers()
    for key in ("mm_classifier", "vision_classifier", "text_classifier", "fusion_weight"):
        np.testing.assert_allclose(
            out_m[key], out_s[key], atol=1e-5,
            err_msg=f"chunking changed {key}",
        )
