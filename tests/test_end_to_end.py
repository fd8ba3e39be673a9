"""End-to-end: MM_CLS_OP trainer on the synthetic dataset with a tiny CLIP —
train a few steps, generate classifiers, export artifacts, evaluate all modes.
"""

import os
import os.path as osp

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / "output")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    c.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.OPTIM.WARMUP_EPOCH = 1
    c.OPTIM.WARMUP_TYPE = "constant"
    c.OPTIM.LR_SCHEDULER = "cosine"
    c.TRAIN.CHECKPOINT_FREQ = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    c.EVAL_MODE = "fusion"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


@pytest.fixture(scope="module")
def trainer(cfg):
    from ovmr_tpu.engine.trainer import build_trainer

    return build_trainer(cfg)


def test_train_one_epoch(trainer):
    trainer.train()
    # checkpoints written (native + torch formats)
    assert osp.exists(
        osp.join(trainer.output_dir, "prompt_learner", "model-1.npz")
    )
    assert osp.exists(
        osp.join(trainer.output_dir, "prompt_learner", "model.pth.tar-1")
    )


def test_generate_and_export(trainer):
    out = trainer.generate_classifiers()
    n = trainer.n_cls
    d = trainer.clip_cfg.embed_dim
    assert out["mm_classifier"].shape == (n, d)
    assert out["vision_classifier"].shape == (n, d)
    assert out["fusion_weight"].shape == (n, 3)
    # unit-norm rows
    np.testing.assert_allclose(
        np.linalg.norm(out["mm_classifier"], axis=-1), 1.0, atol=1e-3
    )
    # torch artifacts exist and load
    import torch

    artifact = torch.load(
        osp.join(trainer.output_dir, "mm_classifiers.pt"), weights_only=False
    )
    assert set(artifact) == {
        "text_classifier", "vision_classifier", "mm_classifier", "fusion_weight",
    }
    assert artifact["mm_classifier"].shape == (n, d)
    vt = torch.load(
        osp.join(trainer.output_dir, "visual_tokens.pt"), weights_only=False
    )
    assert vt["visual_tokens"].shape == (n, trainer.n_ctx, d)


@pytest.mark.parametrize("mode", ["text", "vision", "multimodal", "fusion"])
def test_eval_modes(trainer, mode):
    trainer.cfg.defrost()
    trainer.cfg.EVAL_MODE = mode
    trainer.cfg.freeze()
    acc = trainer.test()
    assert 0.0 <= acc <= 100.0


def test_checkpoint_roundtrip(trainer, cfg):
    from ovmr_tpu.engine import checkpoint as ckpt

    params, opt_state, epoch = ckpt.load_checkpoint(
        trainer.output_dir, "prompt_learner", trainer.agg_params, trainer.opt_state
    )
    assert epoch == 1
    np.testing.assert_allclose(
        np.asarray(params["cls_token"]),
        np.asarray(trainer.agg_params["cls_token"]),
        atol=1e-6,
    )

    # torch-format roundtrip through the reference loader path
    from ovmr_tpu.models.import_torch import load_prompt_learner

    p2, ep2 = load_prompt_learner(
        osp.join(trainer.output_dir, "prompt_learner", "model.pth.tar-1")
    )
    np.testing.assert_allclose(
        np.asarray(p2["blocks"]["w_qkv"]),
        np.asarray(trainer.agg_params["blocks"]["w_qkv"]),
        atol=1e-6,
    )
