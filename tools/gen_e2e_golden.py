"""Full-loop end-to-end golden: the REAL reference Dassl stack, whole loop.

Every other trajectory golden injects recorded batches into the reference
trainer's ``forward_backward``. This one goes one level up and runs the
ENTIRE reference composition on a real on-disk image dataset:

    build_trainer(cfg) -> DataManager (DigitsDG reader, dassl
    ``data_manager.py`` DatasetWrapper, ``transforms.py`` build_transform,
    SequentialSampler) -> SimpleTrainer.train() (before_train / run_epoch /
    after_epoch checkpointing / after_train test()) -> Classification
    evaluator,

recording per-iteration losses/accuracies/lrs, per-batch label+domain
composition, per-test-item logits, and the final `=> result` metrics.
``tests/test_e2e_fullloop_parity.py`` replays the identical cfg through OUR
``build_trainer``/``train()``/``test()`` against the SAME committed image
files — pinning the data pipeline, batch order, epoch loop, optimizer/
scheduler stepping, and evaluator JOINTLY.

Determinism design (the reasons this pin can be tight):
- Within each (source-domain, split, class) directory all JPEGs are
  byte-identical, so ``glob.glob``'s unspecified FS order (reference
  ``dg/digits_dg.py:66``) cannot change any batch tensor. Target-domain
  (test) images are distinct — evaluation metrics are order-invariant.
- ``SequentialSampler`` on both sides: the batch stream IS the
  domain-major/sorted-class data_source order (pinned via the recorded
  label+domain grids).
- ``INPUT.TRANSFORMS=["normalize"]`` on exactly-``INPUT.SIZE`` images:
  the Resize(max)+CenterCrop chain (``transforms.py:264-267``) degenerates
  to identity, so transform parity cannot leak resampling noise into the
  trajectory. (Resize/interpolation parity is pinned separately in
  tests/test_data.py against torchvision semantics.)
- The generator asserts the min top-2 logit margin over the test set, so
  the argmax predictions the metrics derive from cannot flip under fp32
  cross-framework noise (~1e-6).

Reference divergence shimmed to INTENT (documented, same policy as
models/exploratory.py): ``SimpleTrainer.model_inference`` passes
``label=`` to ``SimpleNet.forward`` which does not accept it (fork
``dassl/engine/trainer.py:509-513`` vs ``:61`` — broken for every
non-CLIP model; only the OVMR CustomCLIP trainers override it). The
golden wraps model_inference to ``self.model(input)``.

Run from repo root with /root/reference mounted:
    python tools/gen_e2e_golden.py
"""

import os
import os.path as osp
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

FIXTURE_ROOT = "tests/fixtures/e2e_dataset"
GOLDEN = "tests/fixtures/e2e_fullloop_golden.npz"

CLASSES = ["0", "1", "2", "3"]
SOURCE_DOMAINS = ["mnist", "mnist_m"]
TARGET_DOMAIN = "svhn"
SIZE = 32
TRAIN_PER_CLASS = 4  # identical copies per (source domain, class)
VAL_PER_CLASS = 1
TEST_TRAIN_PER_CLASS = 2  # target domain "all" split = train + val dirs
TEST_VAL_PER_CLASS = 1

EPOCHS = 3
BATCH = 8
# Chaos-bounded lr (the trajectory-golden methodology, docs/ROUND5.md):
# with a BN mlp head this composition is hopeless (1e-6 init perturbation
# -> 0.18 loss spread by step 12 even at lr 3e-3, because BN over batches
# with only two DISTINCT rows has near-zero variance and 1/sqrt(var)
# explodes; at lr 2e-2 even the headless net drifts). Headless at 3e-3
# the reference's 1e-6 self-sensitivity is 4.8e-7 over all 12 steps.
# run_reference() re-measures it on every regeneration and asserts it
# stays below SELF_SENS_BUDGET, keeping the test's rtol honest.
LR, WD, WARMUP_MIN_LR = 3e-3, 5e-4, 1e-5
SELF_SENS_BUDGET = 3e-5
SEED = 7

PIXEL_MEAN = [0.5, 0.5, 0.5]
PIXEL_STD = [0.25, 0.25, 0.25]

PERM = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)


def t2np(t):
    # copy: .numpy() on fp32 CPU tensors SHARES storage with live params
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


def dump_simplenet(data, model, prefix):
    # headless SimpleNet: classifier directly on the flattened conv
    # features (a BN head over batches with only two DISTINCT rows — the
    # identical-image determinism trick — is a chaos amplifier: tiny
    # batch variance makes 1/sqrt(var) explode a 1e-6 perturbation to
    # 0.18 by step 12; BN-trajectory coverage lives in the FixMatch/
    # AdaBN/SE goldens instead)
    bb = model.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    data[f"{prefix}/params/classifier/kernel"] = t2np(
        model.classifier.weight
    ).T[PERM].copy()
    data[f"{prefix}/params/classifier/bias"] = t2np(model.classifier.bias)


# ---------------------------------------------------------------------------
# Dataset fabrication (committed: JPEG bytes are frozen so PIL-version drift
# can never silently change the decoded pixels the goldens were cut from)
# ---------------------------------------------------------------------------

def _save(img_u8, path):
    Image.fromarray(img_u8, "RGB").save(path, "JPEG", quality=95)


def build_dataset_fixture():
    root = osp.join(FIXTURE_ROOT, "digits_dg")
    if osp.exists(root):
        shutil.rmtree(root)
    rng = np.random.default_rng(20260819)

    # strongly separable class signatures (shared across domains) so the
    # trained net classifies the target domain with wide logit margins
    base = {
        c: rng.integers(0, 256, (SIZE, SIZE, 3)).astype(np.int32)
        for c in CLASSES
    }
    tint = {"mnist": 0, "mnist_m": 40, TARGET_DOMAIN: 20}

    def class_img(domain, cname, noise_rng=None):
        img = base[cname] + tint[domain]
        if noise_rng is not None:
            img = img + noise_rng.integers(-12, 13, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)

    for dom in SOURCE_DOMAINS:
        for split, n in (("train", TRAIN_PER_CLASS), ("val", VAL_PER_CLASS)):
            for cname in CLASSES:
                d = osp.join(root, dom, split, cname)
                os.makedirs(d)
                u8 = class_img(dom, cname)  # identical within the dir
                for k in range(n):
                    _save(u8, osp.join(d, f"img{k}.jpg"))

    for split, n in (
        ("train", TEST_TRAIN_PER_CLASS), ("val", TEST_VAL_PER_CLASS)
    ):
        for cname in CLASSES:
            d = osp.join(root, TARGET_DOMAIN, split, cname)
            os.makedirs(d)
            for k in range(n):  # distinct noisy views: metrics are
                _save(class_img(TARGET_DOMAIN, cname, rng),  # order-free
                      osp.join(d, f"img{k}.jpg"))
    n_files = sum(len(f) for _, _, f in os.walk(root))
    print(f"fixture dataset: {n_files} JPEGs under {root}")


# ---------------------------------------------------------------------------
# Reference full-loop run
# ---------------------------------------------------------------------------

def _make_trainer(torch):
    from dassl.config import get_cfg_default
    from dassl.engine import build_trainer

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = tempfile.mkdtemp(prefix="e2e_ref_")
    cfg.SEED = SEED
    cfg.USE_CUDA = False
    cfg.DATASET.ROOT = FIXTURE_ROOT
    cfg.DATASET.NAME = "DigitsDG"
    cfg.DATASET.SOURCE_DOMAINS = list(SOURCE_DOMAINS)
    cfg.DATASET.TARGET_DOMAINS = [TARGET_DOMAIN]
    cfg.INPUT.SIZE = (SIZE, SIZE)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.INPUT.PIXEL_MEAN = PIXEL_MEAN
    cfg.INPUT.PIXEL_STD = PIXEL_STD
    cfg.DATALOADER.TRAIN_X.SAMPLER = "SequentialSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
    cfg.DATALOADER.TEST.BATCH_SIZE = BATCH
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = ""  # headless: see dump_simplenet
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.WEIGHT_DECAY = WD
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = WARMUP_MIN_LR
    cfg.TRAINER.NAME = "Vanilla"
    cfg.TRAIN.PRINT_FREQ = 1

    torch.manual_seed(SEED)
    trainer = build_trainer(cfg)
    # intent shim for the fork's broken non-CLIP model_inference (docstring)
    trainer.model_inference = (
        lambda input, scale_no=0, label=None: trainer.model(input)
    )
    return trainer


def run_reference():
    from tools._reference_harness import install

    torch = install(".")
    from tools._tv_mini import install_tv_mini

    install_tv_mini()

    trainer = _make_trainer(torch)
    out_dir = trainer.cfg.OUTPUT_DIR

    data = {}
    dump_simplenet(data, trainer.model, "init")

    losses, accs, lrs = [], [], []
    batch_labels, batch_domains = [], []
    orig_fb = trainer.forward_backward

    def rec_fb(batch):
        lrs.append(trainer.get_current_lr())
        batch_labels.append(batch["label"].numpy().copy())
        batch_domains.append(batch["domain"].numpy().copy())
        out = orig_fb(batch)
        losses.append(out["loss"])
        accs.append(out["acc"])
        return out

    trainer.forward_backward = rec_fb

    impaths_box, logits, labels_t = [], [], []
    orig_pbt = trainer.parse_batch_test

    def rec_pbt(batch):
        impaths_box.append(
            ["/".join(p.rsplit("/", 2)[-2:]) for p in batch["impath"]]
        )
        inp, lab = orig_pbt(batch)
        with torch.no_grad():
            logits.append(t2np(trainer.model(inp)))
        labels_t.append(lab.numpy().copy())
        return inp, lab

    trainer.parse_batch_test = rec_pbt

    results_box = {}
    orig_eval = trainer.evaluator.evaluate

    def rec_eval():
        res = orig_eval()
        results_box.update(res)
        return res

    trainer.evaluator.evaluate = rec_eval

    trainer.train()  # full loop: before_train .. after_train (test inside)

    dump_simplenet(data, trainer.model, "final")

    # flat per-test-item view keyed by "<class>/<file>" (glob order is
    # unspecified -> sort by name for a stable cross-side comparison)
    names = [n for b in impaths_box for n in b]
    lg = np.concatenate(logits, 0)
    lb = np.concatenate(labels_t, 0)
    order = np.argsort(np.asarray(names))
    names = [names[i] for i in order]
    lg, lb = lg[order], lb[order]
    preds = lg.argmax(1)
    top2 = np.sort(lg, axis=1)
    margin = float((top2[:, -1] - top2[:, -2]).min())
    assert margin > 1e-3, f"degenerate argmax margin {margin}; reseed"

    # self-sensitivity probe: replay the reference against ITSELF with a
    # 1e-6 init perturbation; the spread bounds what any faithful
    # cross-framework port can be expected to reproduce (methodology:
    # docs/ROUND5.md "chaos-bounded tolerances")
    trainer2 = _make_trainer(torch)
    with torch.no_grad():
        trainer2.model.classifier.bias.add_(1e-6)
    losses2 = []
    orig_fb2 = trainer2.forward_backward
    trainer2.forward_backward = (
        lambda b: (lambda o: (losses2.append(o["loss"]), o)[1])(orig_fb2(b))
    )
    trainer2.train()
    sens = max(abs(a - b) for a, b in zip(losses, losses2))
    print("reference self-sensitivity (1e-6 init perturbation):", sens)
    assert sens < SELF_SENS_BUDGET, (
        f"lr {LR} is chaotic here: self-sensitivity {sens}; lower LR"
    )
    shutil.rmtree(trainer2.cfg.OUTPUT_DIR, ignore_errors=True)

    data.update(
        self_sensitivity=np.float64(sens),
        losses=np.asarray(losses, np.float64),
        accs=np.asarray(accs, np.float64),
        lrs=np.asarray(lrs, np.float64),
        batch_labels=np.stack(batch_labels).astype(np.int32),
        batch_domains=np.stack(batch_domains).astype(np.int32),
        test_names=np.asarray(names),
        test_logits=lg.astype(np.float64),
        test_labels=lb.astype(np.int32),
        test_preds=preds.astype(np.int32),
        results=np.asarray(
            [results_box["accuracy"], results_box["error_rate"],
             results_box["macro_f1"]], np.float64,
        ),
        optim_scalars=np.asarray([LR, WD, WARMUP_MIN_LR], np.float64),
        margin=np.float64(margin),
    )
    np.savez_compressed(GOLDEN, **data)
    print("losses:", losses)
    print("accs:", accs)
    print("results:", results_box, "margin:", margin)
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    build_dataset_fixture()
    run_reference()
    print("wrote", GOLDEN)
