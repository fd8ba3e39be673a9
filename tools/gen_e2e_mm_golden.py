"""Full-loop end-to-end golden for the FLAGSHIP trainer: the REAL reference
MM_CLS_OP run through the ENTIRE reference composition.

tools/gen_e2e_golden.py pins the generic Dassl loop (Vanilla on DigitsDG).
This one does the same one level up the value chain — the OVMR flagship:

    dassl build_trainer(cfg) -> DataManager (DescribableTextures split-json
    reader -> few-shot pickle cache -> DatasetWrapper/build_transform ->
    RandomClassSampler + the eval_set_loader) -> MM_CLS_OP.build_model
    (PromptLearner on a tiny CLIP) -> SimpleTrainer.train() (epoch loop,
    forward_backward = CustomCLIP train forward + adam + warmup->cosine)
    -> after_train test() (forward_prompt classifier generation, fusion
    eval, mm_classifiers.pt/visual_tokens.pt export, Classification
    evaluator),

on a committed on-disk JPEG dataset. ``tests/test_e2e_mm_fullloop_parity.py``
replays the identical cfg through OUR ``build_trainer``/``train()``/
``test()`` against the SAME image files, loading the SAME tiny-CLIP /
prompt-learner-init checkpoints through our real torch-ingest paths.

Determinism design (why this pin can be tight):
- All train/val JPEGs within a class directory are byte-identical, so
  neither few-shot ``random.sample`` selection, RandomClassSampler's
  shuffles, nor the exemplar/query split can change any TENSOR — only the
  ORDER of the per-class groups inside a batch. Group order is the one
  irreducible cross-framework divergence (python-random vs np.Generator
  streams); the CustomCLIP train loss is group-permutation invariant up
  to fp32 reduction order, and run_reference() MEASURES that sensitivity
  (probe A: reseeded sampler order, recorded splits injected) plus plain
  init chaos (probe B: 1e-6 cls_token perturbation) and asserts both stay
  under SENS_BUDGET so the test's tolerances remain honest.
- Class counts are degenerate-by-design: 4 classes, ncls_per_batch=4 ->
  every batch contains every class exactly once (same SET on both sides).
- ``INPUT.TRANSFORMS=["normalize"]`` on exactly-224px images: the
  Resize+CenterCrop chain degenerates to identity (resampling parity is
  pinned separately in tests/test_data.py).
- The eval_set (= the few-shot train split) has identical exemplars per
  class, so ``forward_prompt``'s label-indexed classifier scatter
  (``mm_classifier_one_prompt.py:215-292``) is batch-order-free.
- The exemplar/query ``split_point`` (``mm_…:300``) is a torch.randint
  draw: RECORDED here, injected into our trainer's ``py_rng`` by the test
  (the established RNG-coupling methodology of the trajectory goldens).
- torcheval is stubbed by the harness; ``multiclass_f1_score`` is patched
  with an exact 2tp/(2tp+fp+fn) implementation (the torcheval semantics
  our ops/fusion.py mirrors; cross-checked against the committed
  forward_prompt golden).

Run from repo root with /root/reference mounted:
    python tools/gen_e2e_mm_golden.py
"""

import copy
import os
import os.path as osp
import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from tools._reference_harness import (  # noqa: E402
    install,
    sparsify_token_embedding,
    zero_dropout,
)

FIXTURE_ROOT = "tests/fixtures/e2e_mm_dataset"
GOLDEN = "tests/fixtures/e2e_mm_fullloop_golden.npz"

CLASSNAMES = ["banded", "dotted", "knitted", "zigzagged"]
SIZE = 224
TRAIN_PER_CLASS = 8   # byte-identical within a class dir
VAL_PER_CLASS = 4     # = min(NUM_SHOTS, 4), the reference val few-shot
TEST_PER_CLASS = 3    # distinct (metrics are order-invariant)

N_CTX = 2
N_INS = 4
NUM_SHOTS = 8         # train few-shot AND eval_set_loader n_ins
BATCH = 16            # ncls_per_batch = 4 = len(CLASSNAMES): degenerate
EPOCHS = 3            # 2 batches/epoch (8 shots / 4 n_ins) -> 6 steps
BASE_LR, CONS_LR, WD = 2e-4, 1e-5, 5e-4
EVAL_TAU = 10.0
SEED = 1
SENS_BUDGET = 5e-5

data = {}


def t2np(t):
    # copy: .numpy() on fp32 CPU tensors SHARES storage with live params
    return t.detach().cpu().float().numpy().copy()


# ---------------------------------------------------------------------------
# Dataset fabrication (low-frequency signatures so the committed JPEGs stay
# small; bytes are frozen so PIL drift can never change the decoded pixels)
# ---------------------------------------------------------------------------

def _save(img_u8, path):
    Image.fromarray(img_u8, "RGB").save(path, "JPEG", quality=95)


def _lowfreq(rng, amp=127.0):
    coarse = rng.standard_normal((8, 8, 3))
    img = np.asarray(
        Image.fromarray(
            np.clip(coarse * 40 + 128, 0, 255).astype(np.uint8), "RGB"
        ).resize((SIZE, SIZE), Image.BILINEAR),
        np.float32,
    )
    return img


def build_dataset_fixture():
    root = osp.join(FIXTURE_ROOT, "dtd")
    if osp.exists(root):
        shutil.rmtree(root)
    img_dir = osp.join(root, "images")
    rng = np.random.default_rng(20260820)

    base = {c: _lowfreq(rng) for c in CLASSNAMES}
    split = {"train": [], "val": [], "test": []}
    for label, cname in enumerate(CLASSNAMES):
        d = osp.join(img_dir, cname)
        os.makedirs(d)
        u8 = np.clip(base[cname], 0, 255).astype(np.uint8)
        canon = osp.join(d, "train0.jpg")
        _save(u8, canon)
        for k in range(TRAIN_PER_CLASS):
            p = osp.join(d, f"train{k}.jpg")
            if k:
                shutil.copyfile(canon, p)  # byte-identical
            split["train"].append([f"{cname}/train{k}.jpg", label, cname])
        vcanon = osp.join(d, "val0.jpg")
        _save(u8, vcanon)
        for k in range(VAL_PER_CLASS):
            p = osp.join(d, f"val{k}.jpg")
            if k:
                shutil.copyfile(vcanon, p)
            split["val"].append([f"{cname}/val{k}.jpg", label, cname])
        for k in range(TEST_PER_CLASS):  # distinct noisy views
            u8t = np.clip(base[cname] + _lowfreq(rng) * 0.25 - 32, 0, 255)
            _save(u8t.astype(np.uint8), osp.join(d, f"test{k}.jpg"))
            split["test"].append([f"{cname}/test{k}.jpg", label, cname])

    import json

    with open(osp.join(root, "split_zhou_DescribableTextures.json"), "w") as f:
        json.dump(split, f)
    n_files = sum(len(fs) for _, _, fs in os.walk(root))
    print(f"fixture dataset: {n_files} files under {root}")


# ---------------------------------------------------------------------------
# Reference full-loop run
# ---------------------------------------------------------------------------

def real_multiclass_f1(torch):
    """Exact torcheval ``multiclass_f1_score(average=None)``: per-class
    2tp/(2tp+fp+fn), 0 where the denominator is 0 (the semantics
    ops/fusion.py mirrors; the harness stubs torcheval itself)."""

    def f1(logits, labels, num_classes, average=None):
        assert average is None
        preds = logits.argmax(dim=-1)
        tp = torch.zeros(num_classes, dtype=torch.float64)
        pred_c = torch.zeros(num_classes, dtype=torch.float64)
        lab_c = torch.zeros(num_classes, dtype=torch.float64)
        for c in range(num_classes):
            tp[c] = ((preds == c) & (labels == c)).sum()
            pred_c[c] = (preds == c).sum()
            lab_c[c] = (labels == c).sum()
        denom = pred_c + lab_c
        out = torch.where(
            denom > 0, 2.0 * tp / denom.clamp(min=1.0), torch.zeros(())
        )
        return out.float()

    return f1


def make_cfg():
    from yacs.config import CfgNode as CN

    from dassl.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.TRAINER.COCOOP = CN()
    cfg.TRAINER.COCOOP.N_CTX = N_CTX
    cfg.TRAINER.COCOOP.CTX_INIT = ""
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.DATASET.SUBSAMPLE_CLASSES = "all"
    cfg.EVAL_MODE = "fusion"
    cfg.EVAL_TAU = EVAL_TAU

    cfg.OUTPUT_DIR = tempfile.mkdtemp(prefix="e2e_mm_ref_")
    cfg.SEED = SEED
    cfg.USE_CUDA = False
    cfg.DATASET.ROOT = FIXTURE_ROOT
    cfg.DATASET.NAME = "DescribableTextures"
    cfg.DATASET.NUM_SHOTS = NUM_SHOTS
    cfg.INPUT.SIZE = (SIZE, SIZE)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
    cfg.DATALOADER.TRAIN_X.N_INS = N_INS
    cfg.DATALOADER.TEST.BATCH_SIZE = BATCH
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "TINY_E2E_224"  # load_clip_to_cpu is patched
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = BASE_LR
    cfg.OPTIM.WEIGHT_DECAY = WD
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
    cfg.TRAINER.NAME = "MM_CLS_OP"
    cfg.TRAIN.PRINT_FREQ = 1
    return cfg


def make_tiny_clip(torch):
    from clip import clip as ref_clip
    from clip.model import CLIP

    torch.manual_seed(0)
    clip_model = CLIP(
        embed_dim=64,
        image_resolution=SIZE,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=32,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        # width//64: the head count is NOT recoverable from state-dict
        # shapes, so the checkpoint must follow the OpenAI convention our
        # shape-sniffer (import_torch.clip_config_from_state_dict) assumes
        transformer_heads=1,
        transformer_layers=2,
    ).float()
    prompts = ["a " + n + "." for n in CLASSNAMES] + ["a ."]
    tok = torch.cat([ref_clip.tokenize(p) for p in prompts])
    sparsify_token_embedding(clip_model, tok.flatten().tolist())
    return clip_model


def build_ref_trainer(torch, base_clip, cfg):
    import datasets.dtd  # noqa: F401  registers DescribableTextures
    import trainers.mm_classifier_one_prompt as mm
    from dassl.engine import build_trainer

    mm.load_clip_to_cpu = lambda cfg: copy.deepcopy(base_clip)
    mm.multiclass_f1_score = real_multiclass_f1(torch)
    random.seed(SEED)  # reference train.py setup: set_random_seed
    np.random.seed(SEED)
    torch.manual_seed(SEED)  # aggregator init draws
    trainer = build_trainer(cfg)
    zero_dropout(trainer.model)
    return trainer


def run_loop(torch, trainer, inject_splits=None):
    """Train the full loop; returns (losses, lrs, splits, batches, test)."""
    losses, lrs, splits = [], [], []
    batch_labels, batch_imgs = [], []
    orig_fb = trainer.forward_backward
    orig_randint = torch.randint
    if inject_splits is None:
        def randint(lo, hi, size, **k):
            v = orig_randint(lo, hi, size, **k)
            splits.append(int(v[0]))
            return v
    else:
        it = iter(inject_splits)

        def randint(lo, hi, size, **k):
            v = next(it)
            splits.append(int(v))
            return torch.tensor([int(v)])

    def rec_fb(batch):
        lrs.append(trainer.get_current_lr())
        batch_labels.append(batch["label"].numpy().copy())
        if len(batch_imgs) < 1:
            batch_imgs.append(batch["img"].numpy().copy())
        out = orig_fb(batch)
        losses.append(out["loss"])
        return out

    trainer.forward_backward = rec_fb

    impaths_box, logits, labels_t = [], [], []
    orig_pbt = trainer.parse_batch_test

    def rec_pbt(batch):
        impaths_box.append(
            ["/".join(p.rsplit("/", 2)[-2:]) for p in batch["impath"]]
        )
        inp, lab = orig_pbt(batch)
        labels_t.append(lab.numpy().copy())
        return inp, lab

    trainer.parse_batch_test = rec_pbt

    orig_mi = trainer.model_inference

    def rec_mi(input, scale_no=0, label=None):
        out = orig_mi(input, scale_no=scale_no, label=label)
        logits.append(t2np(out))
        return out

    trainer.model_inference = rec_mi

    results_box = {}
    orig_eval = trainer.evaluator.evaluate

    def rec_eval():
        res = orig_eval()
        results_box.update(res)
        return res

    trainer.evaluator.evaluate = rec_eval

    torch.randint = lambda *a, **k: randint(*a, **k)
    try:
        trainer.train()  # full loop: before_train .. after_train (test())
    finally:
        torch.randint = orig_randint

    names = [n for b in impaths_box for n in b]
    lg = np.concatenate(logits, 0)
    lb = np.concatenate(labels_t, 0)
    order = np.argsort(np.asarray(names))
    test = {
        "names": [names[i] for i in order],
        "logits": lg[order],
        "labels": lb[order],
        "results": results_box,
    }
    return losses, lrs, splits, (batch_labels, batch_imgs), test


def run_reference():
    torch = install(".")
    from tools._tv_mini import install_tv_mini

    install_tv_mini()
    # the harness aliases the fp16 DTYPE to fp32 but ``.half()`` still
    # casts; forward_prompt stores classifiers via ``.half()``
    # (``mm_…:251``) — identity keeps the golden fp32 end to end
    torch.Tensor.half = lambda self: self

    base_clip = make_tiny_clip(torch)
    for k, v in base_clip.state_dict().items():
        data[f"clip.{k}"] = t2np(v)

    # ---- run 1: the recorded golden --------------------------------------
    cfg = make_cfg()
    trainer = build_ref_trainer(torch, base_clip, cfg)
    for k, v in trainer.model.prompt_learner.state_dict().items():
        data[f"pl_init.{k}"] = t2np(v)
    losses, lrs, splits, (blabels, bimgs), test = run_loop(torch, trainer)
    for k, v in trainer.model.prompt_learner.state_dict().items():
        data[f"pl_final.{k}"] = t2np(v)

    # exported artifacts (the reference wrote them during forward_prompt)
    exp = torch.load(
        osp.join(cfg.OUTPUT_DIR, "mm_classifiers.pt"), map_location="cpu",
        weights_only=False,
    )
    for k, v in exp.items():
        data[f"export.{k}"] = t2np(v)
    vt = torch.load(
        osp.join(cfg.OUTPUT_DIR, "visual_tokens.pt"), map_location="cpu",
        weights_only=False,
    )
    data["export.visual_tokens"] = t2np(vt["visual_tokens"])
    shutil.rmtree(cfg.OUTPUT_DIR, ignore_errors=True)

    # one decoded+normalized image per class (group row 0 of batch 0,
    # sorted by label) — pins decode + normalize + layout on our side
    imgs0 = bimgs[0].reshape(len(CLASSNAMES), N_INS, 3, SIZE, SIZE)[:, 0]
    lab0 = blabels[0].reshape(len(CLASSNAMES), N_INS)[:, 0]
    data["class_images"] = imgs0[np.argsort(lab0)].astype(np.float16)

    margin_arr = np.sort(test["logits"], axis=1)
    margin = float((margin_arr[:, -1] - margin_arr[:, -2]).min())
    assert margin > 1e-3, f"degenerate argmax margin {margin}; reseed"

    # ---- probe A: different sampler ORDER, same splits --------------------
    cfgA = make_cfg()
    trainerA = build_ref_trainer(torch, base_clip, cfgA)
    random.seed(SEED + 777)  # sampler order diverges from here on
    lossesA, _, _, _, testA = run_loop(torch, trainerA, inject_splits=splits)
    shutil.rmtree(cfgA.OUTPUT_DIR, ignore_errors=True)
    sensA = max(abs(a - b) for a, b in zip(losses, lossesA))
    evalA = float(np.abs(test["logits"] - testA["logits"]).max())

    # ---- probe B: 1e-6 init perturbation, same order + splits -------------
    cfgB = make_cfg()
    trainerB = build_ref_trainer(torch, base_clip, cfgB)
    with torch.no_grad():
        trainerB.model.prompt_learner.cls_token.add_(1e-6)
    lossesB, _, _, _, testB = run_loop(torch, trainerB, inject_splits=splits)
    shutil.rmtree(cfgB.OUTPUT_DIR, ignore_errors=True)
    sensB = max(abs(a - b) for a, b in zip(losses, lossesB))
    evalB = float(np.abs(test["logits"] - testB["logits"]).max())

    print(f"self-sensitivity: order={sensA:.3g} perturb={sensB:.3g} "
          f"eval order={evalA:.3g} perturb={evalB:.3g}")
    sens = max(sensA, sensB)
    assert sens < SENS_BUDGET, (
        f"lr {BASE_LR} is chaotic here: self-sensitivity {sens}; lower LR"
    )

    data.update(
        self_sensitivity=np.float64(sens),
        eval_sensitivity=np.float64(max(evalA, evalB)),
        losses=np.asarray(losses, np.float64),
        lrs=np.asarray(lrs, np.float64),
        splits=np.asarray(splits, np.int32),
        batch_labels_sorted=np.stack(
            [np.sort(b) for b in blabels]
        ).astype(np.int32),
        test_names=np.asarray(test["names"]),
        test_logits=test["logits"].astype(np.float64),
        test_labels=test["labels"].astype(np.int32),
        test_preds=test["logits"].argmax(1).astype(np.int32),
        results=np.asarray(
            [test["results"]["accuracy"], test["results"]["error_rate"],
             test["results"]["macro_f1"]], np.float64,
        ),
        optim_scalars=np.asarray(
            [BASE_LR, CONS_LR, WD, EVAL_TAU], np.float64
        ),
        margin=np.float64(margin),
    )
    np.savez_compressed(GOLDEN, **data)
    print("losses:", losses)
    print("lrs:", lrs)
    print("splits:", splits)
    print("results:", test["results"], "margin:", margin)


if __name__ == "__main__":
    build_dataset_fixture()
    run_reference()
    print("wrote", GOLDEN)
