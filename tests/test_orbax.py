"""Optional Orbax checkpoint backend roundtrip."""

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.engine.optimizers import build_optimizer
from ovmr_tpu.engine.orbax_io import load_orbax, save_orbax
from ovmr_tpu.utils.defaults import get_cfg_default


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    opt = build_optimizer(get_cfg_default().OPTIM)
    state = opt.init(params)

    save_orbax(str(tmp_path), "prompt_learner", 5, params, state)
    p2, s2, epoch = load_orbax(str(tmp_path), "prompt_learner", params, state)
    assert epoch == 5
    np.testing.assert_allclose(np.asarray(p2["w"]), np.arange(4.0))
    assert s2 is not None

    # explicit-epoch load
    p3, _, ep3 = load_orbax(str(tmp_path), "prompt_learner", params, state, epoch=5)
    assert ep3 == 5

    # params-only restore of a checkpoint saved WITH optimizer state
    # (inference path; was broken before params/opt_state were separated)
    p4, s4, ep4 = load_orbax(str(tmp_path), "prompt_learner", params)
    assert ep4 == 5 and s4 is None
    np.testing.assert_allclose(np.asarray(p4["w"]), np.arange(4.0))

    with pytest.raises(FileNotFoundError):
        load_orbax(str(tmp_path / "nope"), "prompt_learner", params)


def test_trainer_orbax_backend(tmp_path):
    """TPU.CHECKPOINT_BACKEND=orbax drives the full save -> auto-resume
    cycle through the orbax backend inside a real trainer."""
    pytest.importorskip("orbax.checkpoint")
    import os

    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 4
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["normalize"]
    cfg.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TRAIN_X.N_INS = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.MODEL.BACKBONE.NAME = "TINY"
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAINER.NAME = "MM_CLS_OP"
    cfg.TRAIN.CHECKPOINT_FREQ = 1
    cfg.TEST.NO_TEST = True
    cfg.TPU.DTYPE = "float32"
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    t = build_trainer(cfg)
    t.train()
    ckdir = os.path.join(cfg.OUTPUT_DIR, "prompt_learner")
    assert os.path.exists(os.path.join(ckdir, "orbax-1")), os.listdir(ckdir)

    # auto-resume from OUTPUT_DIR picks the orbax checkpoint back up
    t2 = build_trainer(cfg)
    start = t2.resume_model_if_exist(cfg.OUTPUT_DIR)
    assert start == 1
    a = jnp.concatenate([x.ravel() for x in
                         np.asarray(t.agg_params["cls_token"])[None]])
    b = jnp.concatenate([x.ravel() for x in
                         np.asarray(t2.agg_params["cls_token"])[None]])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
