"""ZeroshotCLIP and CoOp (stage-2) trainers on the synthetic dataset."""

import os
import os.path as osp

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def base_cfg(tmp, trainer):
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / f"out_{trainer}")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.TEST.N_INS = 4
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = trainer
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


@pytest.fixture(scope="module")
def tmp(tmp_path_factory):
    return tmp_path_factory.mktemp("trainers")


def test_zeroshot_clip(tmp):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    cfg = base_cfg(tmp, "ZeroshotCLIP")
    t = build_trainer(cfg)
    acc = t.test()
    assert 0.0 <= acc <= 100.0
    assert t.text_classifier.shape == (8, t.clip_cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(t.text_classifier, axis=-1), 1.0, atol=1e-4
    )


def test_zeroshot_clip2_ensemble(tmp):
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "ZeroshotCLIP2")
    t = build_trainer(cfg)
    acc = t.test()
    assert 0.0 <= acc <= 100.0


def test_zeroshot_mesh_matches_single_program(tmp):
    """ZeroshotCLIP honors TPU.MESH: eval encode shards over 'data'
    (default MESH.DATA=-1 -> data=8 on the virtual mesh) and produces the
    same logits as the MESH.DATA=1 single program."""
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()

    cfg_mesh = base_cfg(tmp, "ZeroshotCLIP")
    cfg_mesh.OUTPUT_DIR = cfg_mesh.OUTPUT_DIR + "_mesh"
    os.makedirs(cfg_mesh.OUTPUT_DIR, exist_ok=True)
    cfg_one = base_cfg(tmp, "ZeroshotCLIP")
    cfg_one.OUTPUT_DIR = cfg_one.OUTPUT_DIR + "_one"
    cfg_one.TPU.MESH.DATA = 1
    os.makedirs(cfg_one.OUTPUT_DIR, exist_ok=True)

    t_mesh = build_trainer(cfg_mesh)
    t_one = build_trainer(cfg_one)
    assert t_mesh.mesh is not None and t_one.mesh is None
    np.testing.assert_allclose(
        t_mesh.text_classifier, t_one.text_classifier, atol=1e-6
    )
    t_mesh.prepare_test()
    t_one.prepare_test()
    batch = next(iter(t_one.dm.test_loader))
    np.testing.assert_allclose(
        t_mesh.model_inference(batch), t_one.model_inference(batch),
        atol=2e-5,
        err_msg="mesh-sharded zero-shot eval diverged from single program",
    )

    # TP mesh (data=4 x model=2): towers TP-placed, GSPMD encode — same
    # numbers again
    cfg_tp = base_cfg(tmp, "ZeroshotCLIP")
    cfg_tp.OUTPUT_DIR = cfg_tp.OUTPUT_DIR + "_tp"
    cfg_tp.TPU.MESH.DATA = 4
    cfg_tp.TPU.MESH.MODEL = 2
    os.makedirs(cfg_tp.OUTPUT_DIR, exist_ok=True)
    t_tp = build_trainer(cfg_tp)
    assert t_tp._tp and dict(t_tp.mesh.shape) == {"data": 4, "model": 2}
    np.testing.assert_allclose(
        t_tp.text_classifier, t_one.text_classifier, atol=2e-5
    )
    t_tp.prepare_test()
    np.testing.assert_allclose(
        t_tp.model_inference(batch), t_one.model_inference(batch),
        atol=2e-4,
        err_msg="TP zero-shot eval diverged from single program",
    )


def test_coop_trainer(tmp):
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "CoOp")
    cfg.TRAINER.COOP.N_CTX = 2
    cfg.TRAINER.COOP.CTX_INIT = ""
    cfg.TRAINER.COOP.CSC = False
    cfg.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    t = build_trainer(cfg)

    ctx_before = np.asarray(t.params["ctx"]).copy()
    t.train()
    ctx_after = np.asarray(t.params["ctx"])
    assert not np.allclose(ctx_before, ctx_after)

    acc = t.test()
    assert 0.0 <= acc <= 100.0

    # prompts have the right layout: mm/v/t all [n_cls, 77, dim]
    mm, v, tt = t._build_prompts(t.params)
    assert mm.shape == (8, 77, t.clip_cfg.transformer_width)
    assert v.shape == (8, 77, t.clip_cfg.transformer_width)
    assert tt.shape == (8, 77, t.clip_cfg.transformer_width)


def test_coop_ctx_init_words(tmp):
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "CoOp")
    cfg.OUTPUT_DIR = cfg.OUTPUT_DIR + "_init"
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    t = build_trainer(cfg)
    assert t.n_ctx == 4
    assert t.params["ctx"].shape == (4, t.clip_cfg.transformer_width)
