"""Engine behaviors closed in round 2 (reference
``dassl/engine/trainer.py:403-507``): best-val model selection,
automatic resume-from-OUTPUT_DIR, test/{k} TB scalars, REGION_AUG
multi-scale eval branch."""

import os
import os.path as osp

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def base_cfg(tmp, name):
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / name)
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
    c.DATALOADER.TEST.N_INS = 4
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 2
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


@pytest.fixture(scope="module")
def tmp(tmp_path_factory):
    from ovmr_tpu.engine import register_all_trainers

    register_all_trainers()
    return tmp_path_factory.mktemp("engine_bestval")


def test_best_val_selection(tmp):
    """TEST.FINAL_MODEL == best_val: val-test every epoch, keep model-best,
    deploy it for the final test."""
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "bestval")
    cfg.TEST.NO_TEST = False
    cfg.TEST.FINAL_MODEL = "best_val"
    t = build_trainer(cfg)
    results = []
    orig_test = t.test

    def spy_test(split=None):
        r = orig_test(split=split)
        results.append((split, r))
        return r

    t.test = spy_test
    t.train()
    # two val evals (one per epoch) + the final deploy test
    val_calls = [r for r in results if r[0] == "val"]
    assert len(val_calls) == 2
    assert results[-1][0] is None
    best = osp.join(cfg.OUTPUT_DIR, "prompt_learner", "model-best.npz")
    assert osp.exists(best)
    assert int(np.load(best)["__epoch__"]) in (1, 2)
    assert t.best_result == max(r for _, r in val_calls)


def test_best_val_loads_best_for_final_test(tmp):
    """load_model without an epoch prefers model-best (reference
    ``mm_…:470-476``)."""
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "bestload")
    t = build_trainer(cfg)
    # save epoch-1 weights as best, then perturb and save epoch-2 normally
    t.save_model(1, model_name="model-best")
    import jax

    best_params = jax.tree_util.tree_map(np.asarray, t.agg_params)
    t.agg_params = jax.tree_util.tree_map(lambda x: x + 1.0, t.agg_params)
    t.save_model(2)

    t2 = build_trainer(cfg)
    t2.load_model(cfg.OUTPUT_DIR)  # no epoch -> best
    got = jax.tree_util.tree_map(np.asarray, t2.agg_params)
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(best_params)
    ):
        np.testing.assert_allclose(a, b)


def test_auto_resume_from_output_dir(tmp):
    """A crashed run resumes from OUTPUT_DIR with no RESUME flag
    (reference ``before_train``, trainer.py:403-407)."""
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "autoresume")
    cfg.TRAIN.CHECKPOINT_FREQ = 1
    cfg.OPTIM.MAX_EPOCH = 1
    t = build_trainer(cfg)
    t.train()  # writes epoch-1 checkpoint ("crash" after epoch 1)

    cfg2 = base_cfg(tmp, "autoresume")
    cfg2.TRAIN.CHECKPOINT_FREQ = 1
    cfg2.OPTIM.MAX_EPOCH = 2
    t2 = build_trainer(cfg2)
    epochs_run = []
    orig = t2.run_epoch

    def spy():
        epochs_run.append(t2.epoch)
        return orig()

    t2.run_epoch = spy
    t2.train()
    assert epochs_run == [1]  # epoch 0 skipped: resumed from checkpoint


def test_pointer_follows_torch_checkpoint(tmp):
    """A reference-style dir holding only model.pth.tar-* + pointer loads
    without --load-epoch (reference follows its pointer file)."""
    from ovmr_tpu.engine import checkpoint as ckpt
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "torchptr")
    t = build_trainer(cfg)
    sub = osp.join(cfg.OUTPUT_DIR, "prompt_learner")
    ckpt.save_torch_checkpoint(cfg.OUTPUT_DIR, "prompt_learner", 3, t.agg_params)
    with open(osp.join(sub, "checkpoint"), "w") as f:
        f.write("model.pth.tar-3\n")
    t.load_model(cfg.OUTPUT_DIR)  # follows pointer -> torch file


def test_region_aug_eval_branch(tmp, capsys):
    """DATASET.REGION_AUG: 2*len(REGION_SCALE) eval passes with the
    reference's scale prints; model_inference receives scale_no."""
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "regionaug")
    cfg.DATASET.REGION_AUG = True
    cfg.DATASET.REGION_SCALE = [224, 168]
    t = build_trainer(cfg)
    seen_scale_nos = []
    orig_mi = t.model_inference

    def spy_mi(batch, scale_no=0):
        seen_scale_nos.append(scale_no)
        return orig_mi(batch, scale_no=scale_no)

    t.model_inference = spy_mi
    t.test()
    out = capsys.readouterr().out
    assert out.count("## eval region scale") == 4
    assert "using corresponding single text embedding" in out
    assert "using mean text embeddings" in out
    assert sorted(set(seen_scale_nos)) == [0, 1, 2, 3]


def test_test_writes_tb_scalars(tmp):
    """test() writes {split}/{metric} scalars (reference trainer.py:484-486)."""
    from ovmr_tpu.engine.trainer import build_trainer

    cfg = base_cfg(tmp, "tbscalars")
    t = build_trainer(cfg)
    tags = []
    orig_ws = t.write_scalar

    def spy_ws(tag, value, step):
        tags.append(tag)
        return orig_ws(tag, value, step)

    t.write_scalar = spy_ws
    t.test()
    assert any(tag.startswith("test/accuracy") for tag in tags)
    assert any(tag.startswith("test/macro_f1") for tag in tags)
