"""Full-loop end-to-end parity vs the REAL reference Dassl stack.

The capstone of the trajectory-golden family: every other pin injects
recorded batches into a reference ``forward_backward``; this one ran the
ENTIRE reference composition (``dassl.engine.build_trainer`` ->
``DataManager``/DigitsDG reader/DatasetWrapper/``build_transform``/
``SequentialSampler`` -> ``SimpleTrainer.train()`` -> ``Classification``
evaluator) on a real on-disk JPEG dataset (tools/gen_e2e_golden.py, which
also documents the determinism design), and here the SAME cfg replays
through OUR ``build_trainer``/``train()``/``test()`` against the SAME
committed image files. Jointly pinned:

- dataset reading + transform pipeline + batch ORDER (per-iteration
  label/domain grids asserted inside forward_backward),
- the epoch loop and optimizer/scheduler stepping placement (per-iteration
  losses + lr + train-step accuracy in the reference's percent convention),
- final parameters (headless conv net — see gen_e2e_golden.dump_simplenet
  for why the BN head is excluded HERE; BN trajectories are pinned by the
  FixMatch/AdaBN/SE goldens),
- the eval pass: per-test-item argmax predictions (keyed by
  "<class>/<file>"; the generator asserted a >1e-3 top-2 logit margin so
  fp32 cross-framework noise cannot flip them) and the `=> result`
  metrics (accuracy / error_rate / macro_f1).

Reference run: dassl ``engine/trainer.py:400-434`` (train/after_train),
``data_manager.py:174-221`` (loader construction) on torch CPU via
tools/_reference_harness.py + tools/_tv_mini.py.
"""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = osp.join(
    osp.dirname(__file__), "fixtures", "e2e_fullloop_golden.npz"
)
DATA_ROOT = osp.join(osp.dirname(__file__), "fixtures", "e2e_dataset")

EPOCHS, BATCHES = 3, 4


def _transplant(tree, data, prefix):
    n = 0
    for k in data.files:
        if not k.startswith(prefix + "/"):
            continue
        node = tree
        parts = k[len(prefix) + 1:].split("/")
        for p in parts[:-1]:
            node = node[p]
        assert parts[-1] in node, k
        assert tuple(node[parts[-1]].shape) == tuple(data[k].shape), k
        node[parts[-1]] = jnp.asarray(data[k])
        n += 1
    return n


def _assert_tree_close(tree, data, prefix, atol):
    n = 0
    for k in data.files:
        if not k.startswith(prefix + "/"):
            continue
        node = tree
        for p in k[len(prefix) + 1:].split("/"):
            node = node[p]
        np.testing.assert_allclose(
            node, data[k], atol=atol, rtol=1e-3, err_msg=k
        )
        n += 1
    assert n > 0


@pytest.mark.quick
def test_fullloop_matches_reference_stack(tmp_path, monkeypatch):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer
    from ovmr_tpu.utils.defaults import get_cfg_default

    register_all_trainers()

    data = np.load(FIXTURE)
    lr, wd, warmup_min_lr = data["optim_scalars"]

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 7
    cfg.DATASET.ROOT = DATA_ROOT
    cfg.DATASET.NAME = "DigitsDG"
    cfg.DATASET.SOURCE_DOMAINS = ["mnist", "mnist_m"]
    cfg.DATASET.TARGET_DOMAINS = ["svhn"]
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.INPUT.PIXEL_MEAN = [0.5, 0.5, 0.5]
    cfg.INPUT.PIXEL_STD = [0.25, 0.25, 0.25]
    cfg.DATALOADER.TRAIN_X.SAMPLER = "SequentialSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = ""  # headless — see gen_e2e_golden.dump_simplenet
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(warmup_min_lr)
    cfg.TRAINER.NAME = "Vanilla"
    cfg.TRAIN.PRINT_FREQ = 1
    cfg.TPU.DTYPE = "float32"
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    trainer = build_trainer(cfg)
    assert trainer.dm.num_classes == 4
    assert len(trainer.dm.dataset.train_x) == 32
    assert len(trainer.dm.dataset.test) == 12

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 10
    state["opt_state"] = trainer.tx.init(state["params"])

    # -- record the training stream exactly where the reference recorder sat
    losses, accs = [], []
    it = {"i": 0}
    orig_fb = trainer.forward_backward

    def rec_fb(batch):
        i = it["i"]
        # batch ORDER pin: the sequential stream over the domain-major,
        # sorted-class data_source must compose identical batches
        np.testing.assert_array_equal(
            np.asarray(batch["label"]), data["batch_labels"][i]
        )
        np.testing.assert_array_equal(
            np.asarray(batch["domain"]), data["batch_domains"][i]
        )
        assert trainer.lr_table[trainer.epoch] == pytest.approx(
            data["lrs"][i], rel=1e-12
        )
        out = orig_fb(batch)
        losses.append(out["loss"])
        accs.append(out["acc"])
        it["i"] += 1
        return out

    monkeypatch.setattr(trainer, "forward_backward", rec_fb)

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

    trainer.train()  # the FULL loop; after_train runs test() (NO_TEST off)

    # -- training trajectory
    assert it["i"] == EPOCHS * BATCHES
    np.testing.assert_allclose(
        losses, data["losses"], rtol=3e-5, atol=1e-6
    )
    np.testing.assert_array_equal(accs, data["accs"])

    fstate = trainer.state  # jitted steps rebind _models — read fresh
    final = jax.tree_util.tree_map(np.asarray, fstate["params"])
    _assert_tree_close(final, data, "final/params", atol=5e-5)

    # -- eval pass: per-item predictions + the `=> result` metrics
    assert len(names_box) == 12
    lg = np.concatenate(logits_box, 0)
    order = np.argsort(np.asarray(names_box))
    names = [names_box[i] for i in order]
    lg = lg[order]
    lb = np.asarray(tlabels, np.int32)[order]
    np.testing.assert_array_equal(np.asarray(names), data["test_names"])
    np.testing.assert_array_equal(lb, data["test_labels"])
    np.testing.assert_allclose(
        lg, data["test_logits"], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_array_equal(lg.argmax(1), data["test_preds"])

    ref_acc, ref_err, ref_f1 = data["results"]
    assert results_box["accuracy"] == pytest.approx(ref_acc, rel=1e-9)
    assert results_box["error_rate"] == pytest.approx(ref_err, rel=1e-9)
    assert results_box["macro_f1"] == pytest.approx(ref_f1, rel=1e-9)
