"""Full-loop end-to-end parity for the FLAGSHIP trainer vs the REAL
reference MM_CLS_OP stack.

The fixture (tools/gen_e2e_mm_golden.py, which documents the determinism
design) ran the ENTIRE reference composition — ``dassl build_trainer`` ->
DataManager (DescribableTextures split-json reader, few-shot pickle
cache, RandomClassSampler, eval_set_loader) -> ``MM_CLS_OP.build_model``
(PromptLearner on a tiny CLIP) -> ``SimpleTrainer.train()`` ->
after_train ``test()`` (forward_prompt generation, fusion eval,
mm_classifiers.pt export, Classification evaluator) — over a committed
on-disk JPEG dataset. Here the SAME cfg replays through OUR
``build_trainer``/``train()``/``test()`` against the SAME image files,
with the tiny CLIP and the prompt-learner init ingested through our REAL
torch-checkpoint paths (``OVMR_CLIP_CKPT`` -> ``import_torch.load_clip``;
``MODEL.INIT_WEIGHTS`` -> ``load_prompt_learner``). Jointly pinned:

- the data pipeline: the committed reference-written few-shot pickle is
  consumed by our compat unpickler; per-batch sorted label sets match the
  recording; decoded+normalized per-class pixels match bit-for-fp16;
- the train loop: per-step losses (budgeted by the generator's measured
  self-sensitivity), the exact lr used each step, recorded split points
  injected through ``trainer.py_rng`` (the trajectory-golden RNG-coupling
  methodology — group ORDER inside a batch is the one irreducible
  cross-framework divergence and the generator measured its effect at
  ~7e-7); final prompt-learner params;
- the eval chain: per-test-item fused logits + margin-guarded argmax
  predictions, the `=> result` metrics, and the exported
  ``mm_classifiers.pt``/``visual_tokens.pt`` artifacts.

Reference run: ``trainers/mm_classifier_one_prompt.py`` whole class +
dassl ``engine/trainer.py:400-530`` on torch CPU via
tools/_reference_harness.py.
"""

import os
import os.path as osp

import numpy as np
import pytest

import jax

FIXTURE = osp.join(
    osp.dirname(__file__), "fixtures", "e2e_mm_fullloop_golden.npz"
)
DATA_ROOT = osp.join(osp.dirname(__file__), "fixtures", "e2e_mm_dataset")

N_CLS, N_INS, NUM_SHOTS, N_CTX = 4, 4, 8, 2
EPOCHS, BATCHES = 3, 2
SIZE = 224


class _SplitReplay:
    """Replays the recorded reference torch.randint split draws through
    the ``sample_split_point`` seam (engine/train_step.py:293)."""

    def __init__(self, splits):
        self.splits = list(splits)
        self.i = 0

    def integers(self, lo, hi):
        assert (lo, hi) == (N_INS // 4, (3 * N_INS) // 4)
        v = self.splits[self.i]
        self.i += 1
        return v


def test_mm_fullloop_matches_reference_stack(tmp_path, monkeypatch):
    import torch

    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine import trainer as trainer_mod
    from ovmr_tpu.engine.trainer import build_trainer
    from ovmr_tpu.engine.train_step import make_train_step
    from ovmr_tpu.models.import_torch import (
        prompt_learner_params_from_state_dict,
    )
    from ovmr_tpu.utils.defaults import get_cfg_default
    from tests.helpers import npz_state_dict

    register_all_trainers()
    data = np.load(FIXTURE)
    base_lr, cons_lr, wd, eval_tau = data["optim_scalars"]

    # ---- the fixture towers enter through our REAL ingest paths ----------
    def torch_sd(prefix):
        plen = len(prefix) + 1
        return {
            k[plen:]: torch.from_numpy(np.array(data[k]))
            for k in data.files if k.startswith(prefix + ".")
        }

    clip_pt = tmp_path / "tiny_clip.pt"
    torch.save(torch_sd("clip"), clip_pt)
    monkeypatch.setenv("OVMR_CLIP_CKPT", str(clip_pt))
    pl_pt = tmp_path / "pl_init.pt"
    torch.save({"state_dict": torch_sd("pl_init")}, pl_pt)

    # dropout off, like the reference recording (masks aren't reproducible
    # across frameworks); patch the seam the trainer builds its step with
    orig_mts = make_train_step

    def mts_nodrop(*a, **k):
        k["dropout"] = 0.0
        return orig_mts(*a, **k)

    monkeypatch.setattr(trainer_mod, "make_train_step", mts_nodrop)

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = DATA_ROOT
    cfg.DATASET.NAME = "DescribableTextures"
    cfg.DATASET.NUM_SHOTS = NUM_SHOTS
    cfg.INPUT.SIZE = (SIZE, SIZE)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = N_CLS * N_INS
    cfg.DATALOADER.TRAIN_X.N_INS = N_INS
    cfg.DATALOADER.TEST.BATCH_SIZE = N_CLS * N_INS
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "TINY_E2E_224"  # resolved via OVMR_CLIP_CKPT
    cfg.MODEL.INIT_WEIGHTS = str(pl_pt)
    cfg.TRAINER.NAME = "MM_CLS_OP"
    cfg.TRAINER.COCOOP.N_CTX = N_CTX
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.EVAL_MODE = "fusion"
    cfg.EVAL_TAU = float(eval_tau)
    cfg.TRAIN.PRINT_FREQ = 1
    cfg.TPU.DTYPE = "float32"
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    trainer = build_trainer(cfg)
    assert trainer.dm.num_classes == N_CLS
    # the committed reference-written few-shot pickle is what our compat
    # unpickler consumed: 8 shots per class
    assert len(trainer.dm.dataset.train_x) == N_CLS * NUM_SHOTS
    assert len(trainer.dm.dataset.test) == 12

    trainer.py_rng = _SplitReplay(data["splits"])

    # ---- record the training stream --------------------------------------
    losses, it = [], {"i": 0}
    orig_fb = trainer.forward_backward
    class_images = np.asarray(data["class_images"], np.float32)

    def rec_fb(batch):
        i = it["i"]
        labels = np.asarray(batch["label"])
        # batch composition: every class exactly once per batch, grouped
        np.testing.assert_array_equal(
            np.sort(labels), data["batch_labels_sorted"][i]
        )
        grp = labels.reshape(N_CLS, N_INS)
        assert (grp == grp[:, :1]).all()
        if i == 0:
            # decode+normalize+layout parity: group row 0 per class,
            # sorted by label, vs the reference batch recording
            imgs = np.asarray(batch["img"]).reshape(
                N_CLS, N_INS, 3, SIZE, SIZE
            )[:, 0]
            np.testing.assert_allclose(
                imgs[np.argsort(grp[:, 0])], class_images,
                atol=2e-3, rtol=0,
            )
        assert trainer.lr_table[trainer.epoch] == pytest.approx(
            data["lrs"][i], rel=1e-12
        )
        out = orig_fb(batch)
        losses.append(out["loss"])
        it["i"] += 1
        return out

    monkeypatch.setattr(trainer, "forward_backward", rec_fb)

    # ---- record the eval pass ---------------------------------------------
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

    # ---- training trajectory ----------------------------------------------
    assert it["i"] == EPOCHS * BATCHES
    assert trainer.py_rng.i == EPOCHS * BATCHES
    np.testing.assert_allclose(losses, data["losses"], rtol=1e-4, atol=3e-6)

    ref_final = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "pl_final"), n_layers=4
    )
    final = jax.tree_util.tree_map(
        np.asarray, trainer.agg_params  # read fresh: steps REBIND it
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3),
        final, ref_final,
    )

    # ---- eval: per-item fused logits, predictions, `=> result` metrics ----
    assert len(names_box) == 12
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
    assert float(data["margin"]) > 20 * 3e-4  # argmax can't flip
    np.testing.assert_array_equal(lg.argmax(1), data["test_preds"])

    ref_acc, ref_err, ref_f1 = data["results"]
    assert results_box["accuracy"] == pytest.approx(ref_acc, rel=1e-9)
    assert results_box["error_rate"] == pytest.approx(ref_err, rel=1e-9)
    assert results_box["macro_f1"] == pytest.approx(ref_f1, rel=1e-9)

    # ---- exported artifacts (reference wrote them inside forward_prompt;
    # ours in generate_classifiers) -----------------------------------------
    exp = torch.load(
        osp.join(cfg.OUTPUT_DIR, "mm_classifiers.pt"), map_location="cpu",
        weights_only=False,
    )
    for key, tol in (
        ("text_classifier", 2e-4),
        ("vision_classifier", 2e-4),
        ("mm_classifier", 2e-4),
        ("fusion_weight", 1e-5),
    ):
        np.testing.assert_allclose(
            exp[key].float().numpy(), data[f"export.{key}"],
            atol=tol, rtol=1e-3, err_msg=key,
        )
    vt = torch.load(
        osp.join(cfg.OUTPUT_DIR, "visual_tokens.pt"), map_location="cpu",
        weights_only=False,
    )
    np.testing.assert_allclose(
        vt["visual_tokens"].float().numpy(), data["export.visual_tokens"],
        atol=2e-4, rtol=1e-3,
    )
