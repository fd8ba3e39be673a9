"""Full-loop end-to-end parity for the TrainerXU composition vs the REAL
reference DANN stack.

The fixture (tools/gen_e2e_dann_golden.py, which documents the
determinism design) ran the ENTIRE reference composition — ``dassl
build_trainer("DANN")`` -> DataManager (Office31 folder-tree reader:
train_x = source domain, train_u = test = target domain) ->
``TrainerXU.run_epoch`` with its TWO loaders (COUNT_ITER='train_x';
train_u EXHAUSTS mid-epoch, so the StopIteration re-iteration path runs
at step 2 of every epoch) -> ``DANN.forward_backward`` (GRL global-step
lambda ramp, BN-bearing BCE critic, both optimizers stepped by one loss)
-> adam + constant-warmup -> single_step decay -> after_train ``test()``
— over a committed on-disk JPEG dataset. Here the SAME cfg replays
through OUR ``build_trainer``/``train()``/``test()`` against the SAME
files. SequentialSampler + byte-identical per-class-dir JPEGs make the
whole stream deterministic on BOTH sides, so (unlike the flagship pin)
NO RNG coupling is needed: batch label/domain grids pin EXACTLY.

Jointly pinned: dual-loader batch grids incl. the cycled train_u batch,
per-step loss_x/loss_d (generator-measured 1e-6 self-sensitivity),
train-step accs (the reference percent convention), exact lrs, final
model AND critic params + critic BN running stats, per-test-item logits
+ margin-guarded argmax, and the `=> result` metrics.

Reference run: ``dassl/engine/da/dann.py`` + ``engine/trainer.py:540-607``
(TrainerXU.run_epoch) on torch CPU via tools/_reference_harness.py.
"""

import os
import os.path as osp

import jax
import numpy as np
import pytest

from tests.test_e2e_fullloop_parity import _assert_tree_close, _transplant

FIXTURE = osp.join(
    osp.dirname(__file__), "fixtures", "e2e_dann_fullloop_golden.npz"
)
DATA_ROOT = osp.join(osp.dirname(__file__), "fixtures", "e2e_da_dataset")

EPOCHS, BATCHES = 3, 2


def test_dann_fullloop_matches_reference_stack(tmp_path, monkeypatch):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer
    from ovmr_tpu.utils.defaults import get_cfg_default

    register_all_trainers()
    data = np.load(FIXTURE)
    base_lr, cons_lr, wd, step_size, gamma = data["optim_scalars"]

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = DATA_ROOT
    cfg.DATASET.NAME = "Office31"
    cfg.DATASET.SOURCE_DOMAINS = ["amazon"]
    cfg.DATASET.TARGET_DOMAINS = ["webcam"]
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.DATALOADER.TRAIN_X.SAMPLER = "SequentialSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    cfg.DATALOADER.TRAIN_U.SAME_AS_X = True
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = ""
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (int(step_size),)
    cfg.OPTIM.GAMMA = float(gamma)
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.TRAINER.NAME = "DANN"
    cfg.TRAIN.PRINT_FREQ = 1
    cfg.TPU.DTYPE = "float32"
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    trainer = build_trainer(cfg)
    assert trainer.dm.num_classes == 8
    assert len(trainer.dm.train_loader_x) == 2  # the COUNT_ITER basis
    assert len(trainer.dm.train_loader_u) == 1  # exhausts: cycling path

    state = trainer.state
    assert _transplant(state["params"], data, "init/m/params") == 10
    cstate = trainer._models["critic"]
    assert _transplant(cstate["params"], data, "init/c/params") == 10
    assert _transplant(cstate["batch_stats"], data, "init/c/batch_stats") == 4
    state["opt_state"] = trainer.tx.init(state["params"])
    cstate["opt_state"] = trainer.tx_c.init(cstate["params"])

    # -- record the dual-loader training stream
    losses_x, losses_d, accs = [], [], []
    it = {"i": 0}
    orig_fb = trainer.forward_backward_xu

    def rec_fb(batch_x, batch_u):
        i = it["i"]
        # EXACT batch grids: SequentialSampler over the sorted-class
        # folder order composes identical batches on both sides,
        # including the re-iterated (cycled) train_u batch
        np.testing.assert_array_equal(
            np.asarray(batch_x["label"]), data["batch_x_labels"][i]
        )
        np.testing.assert_array_equal(
            np.asarray(batch_u["domain"]), data["batch_u_domains"][i]
        )
        assert batch_u["img"].shape[0] == data["batch_u_sizes"][i]
        assert trainer.lr_table[trainer.epoch] == pytest.approx(
            data["lrs"][i], rel=1e-12
        )
        out = orig_fb(batch_x, batch_u)
        losses_x.append(out["loss_x"])
        losses_d.append(out["loss_d"])
        accs.append(out["acc_x"])
        it["i"] += 1
        return out

    monkeypatch.setattr(trainer, "forward_backward_xu", rec_fb)

    # -- record the eval pass
    names_box, logits_box, tlabels = [], [], []
    orig_mi = trainer.model_inference

    def rec_mi(batch, scale_no=0):
        out = orig_mi(batch, scale_no=scale_no)
        names_box.extend(
            "/".join(p.rsplit("/", 2)[-2:]) for p in batch["impath"]
        )
        logits_box.append(np.asarray(out))
        tlabels.extend(np.asarray(batch["label"]).tolist())
        return out

    monkeypatch.setattr(trainer, "model_inference", rec_mi)

    results_box = {}
    orig_ev = trainer.evaluator.evaluate

    def rec_ev():
        res = orig_ev()
        results_box.update(res)
        return res

    monkeypatch.setattr(trainer.evaluator, "evaluate", rec_ev)

    trainer.train()  # the FULL loop; after_train runs test()

    # -- training trajectory
    assert it["i"] == EPOCHS * BATCHES
    np.testing.assert_allclose(
        losses_x, data["loss_x"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        losses_d, data["loss_d"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(accs, data["accs"])

    # finals read FRESH (jitted steps rebind the _models entries)
    final_m = jax.tree_util.tree_map(np.asarray, trainer.state["params"])
    _assert_tree_close(final_m, data, "final/m/params", atol=5e-5)
    final_c = jax.tree_util.tree_map(
        np.asarray, trainer._models["critic"]["params"]
    )
    # adam's sign-normalized update amplifies lsb-level grad noise on the
    # critic's near-zero-grad params to ~lr per step (same bound as the
    # DANN trajectory pin); the loss trajectory + BN running stats above
    # are the sensitive instruments for the critic's composition
    _assert_tree_close(
        final_c, data, "final/c/params", atol=8 * float(base_lr)
    )
    final_bs = jax.tree_util.tree_map(
        np.asarray, trainer._models["critic"]["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/c/batch_stats", atol=5e-5)

    # -- eval pass
    assert len(names_box) == 16
    lg = np.concatenate(logits_box, 0)
    order = np.argsort(np.asarray(names_box))
    names = [names_box[i] for i in order]
    lg = lg[order]
    lb = np.asarray(tlabels, np.int32)[order]
    np.testing.assert_array_equal(np.asarray(names), data["test_names"])
    np.testing.assert_array_equal(lb, data["test_labels"])
    np.testing.assert_allclose(
        lg, data["test_logits"], atol=3e-4, rtol=1e-3
    )
    assert float(data["margin"]) > 20 * 3e-4
    np.testing.assert_array_equal(lg.argmax(1), data["test_preds"])

    ref_acc, ref_err, ref_f1 = data["results"]
    assert results_box["accuracy"] == pytest.approx(ref_acc, rel=1e-9)
    assert results_box["error_rate"] == pytest.approx(ref_err, rel=1e-9)
    assert results_box["macro_f1"] == pytest.approx(ref_f1, rel=1e-9)
