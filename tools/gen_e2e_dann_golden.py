"""Full-loop end-to-end golden for the TrainerXU composition: the REAL
reference DANN trainer run through the ENTIRE reference stack.

Completes the full-loop family (gen_e2e_golden.py = TrainerX/Vanilla,
gen_e2e_mm_golden.py = the flagship): this one pins the DUAL-loader
epoch loop the other two can't —

    dassl build_trainer("DANN") -> DataManager (Office31 folder-tree
    reader: train_x = source domain, train_u = test = target domain) ->
    TrainerXU.run_epoch (TRAIN.COUNT_ITER='train_x' batch count, the
    train_u iterator EXHAUSTS mid-epoch and is re-iterated — the
    StopIteration cycling path runs at step 2 of every epoch) ->
    DANN.forward_backward (GRL lambda ramp over GLOBAL steps, BCE critic
    with a BN-bearing mlp body, both optimizers stepped by one loss) ->
    adam + constant-warmup -> single_step decay -> after_train test()
    (Classification evaluator on the target domain),

on a committed on-disk JPEG dataset. ``tests/test_e2e_dann_fullloop_parity.py``
replays the identical cfg through OUR ``build_trainer``/``train()``/
``test()`` against the SAME image files.

Determinism design:
- SequentialSampler on BOTH loaders + byte-identical JPEGs within every
  class directory: ``listdir`` file order cannot change any tensor, and
  the label/domain stream is the sorted-class folder order — batch grids
  pin EXACTLY (no RNG coupling needed anywhere; DANN itself draws no
  randomness: the GRL lambda is a deterministic global-step ramp).
- 8 classes x 2 distinct target rows per train_u batch keep the critic's
  BatchNorm variance healthy (the degenerate-variance chaos mode the
  Vanilla golden documents); the 1e-6-perturbation probe re-measures
  self-sensitivity on every regeneration and gates SENS_BUDGET.
- ``INPUT.TRANSFORMS=["normalize"]`` on exactly-32px images: identity
  transform chain (resampling parity pinned in tests/test_data.py).

Reference divergence shimmed to INTENT (same policy as gen_e2e_golden):
``SimpleTrainer.model_inference`` passes ``label=`` to
``SimpleNet.forward`` which does not accept it (fork
``dassl/engine/trainer.py:509-513`` vs ``:61``) — the golden wraps it to
``self.model(input)``.

Run from repo root with /root/reference mounted:
    python tools/gen_e2e_dann_golden.py
"""

import os
import os.path as osp
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

FIXTURE_ROOT = "tests/fixtures/e2e_da_dataset"
GOLDEN = "tests/fixtures/e2e_dann_fullloop_golden.npz"

CLASSES = [
    "backpack", "bike", "bookcase", "calculator",
    "keyboard", "monitor", "mouse", "mug",
]
SOURCE, TARGET = "amazon", "webcam"
SIZE = 32
TRAIN_PER_CLASS = 4   # source: 8cls x 4 = 32 items -> 2 batches/epoch
TARGET_PER_CLASS = 2  # target: 8cls x 2 = 16 -> ONE train_u batch (cycles)

BATCH = 16
EPOCHS = 3            # 6 steps; warmup->single_step decay lands inside
BASE_LR, CONS_LR, WD = 3e-4, 1e-5, 5e-4
STEP_SIZE, GAMMA = 2, 0.1
SEED = 1
SENS_BUDGET = 5e-5

PERM = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)

data = {}


def t2np(t):
    # copy: .numpy() on fp32 CPU tensors SHARES storage with live params
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


def dump(trainer, prefix):
    """Dump model + critic under OUR flax paths (the torch C-major ->
    NHWC flatten PERM applies to both consumers of the backbone's
    flattened features — tools/gen_trajectory_golden_dann.py:96-118)."""
    model, critic = trainer.model, trainer.critic
    bb = model.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/m/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/m/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    data[f"{prefix}/m/params/classifier/kernel"] = (
        t2np(model.classifier.weight).T[PERM].copy()
    )
    data[f"{prefix}/m/params/classifier/bias"] = t2np(model.classifier.bias)
    critic_body, critic_head = critic[0].mlp, critic[1]
    for i, off in enumerate((0, 3)):  # mlp indices of the two Linears
        fc, bn = critic_body[off], critic_body[off + 1]
        kern = t2np(fc.weight).T
        if i == 0:
            kern = kern[PERM].copy()
        data[f"{prefix}/c/params/fc{i}/kernel"] = kern
        data[f"{prefix}/c/params/fc{i}/bias"] = t2np(fc.bias)
        data[f"{prefix}/c/params/bn{i}/scale"] = t2np(bn.weight)
        data[f"{prefix}/c/params/bn{i}/bias"] = t2np(bn.bias)
        data[f"{prefix}/c/batch_stats/bn{i}/mean"] = t2np(bn.running_mean)
        data[f"{prefix}/c/batch_stats/bn{i}/var"] = t2np(bn.running_var)
    data[f"{prefix}/c/params/logit/kernel"] = t2np(critic_head.weight).T.copy()
    data[f"{prefix}/c/params/logit/bias"] = t2np(critic_head.bias)


# ---------------------------------------------------------------------------
# Dataset fabrication
# ---------------------------------------------------------------------------

def _save(img_f32, path):
    Image.fromarray(
        np.clip(img_f32, 0, 255).astype(np.uint8), "RGB"
    ).save(path, "JPEG", quality=95)


def build_dataset_fixture():
    root = osp.join(FIXTURE_ROOT, "office31")
    if osp.exists(root):
        shutil.rmtree(root)
    rng = np.random.default_rng(20260821)

    base = {
        c: rng.integers(0, 256, (SIZE, SIZE, 3)).astype(np.float32)
        for c in CLASSES
    }
    tint = {SOURCE: 0.0, TARGET: 28.0}

    for dom, n in ((SOURCE, TRAIN_PER_CLASS), (TARGET, TARGET_PER_CLASS)):
        for cname in CLASSES:
            d = osp.join(root, dom, cname)
            os.makedirs(d)
            canon = osp.join(d, "img0.jpg")
            _save(base[cname] + tint[dom], canon)
            for k in range(1, n):
                shutil.copyfile(canon, osp.join(d, f"img{k}.jpg"))
    n_files = sum(len(fs) for _, _, fs in os.walk(root))
    print(f"fixture dataset: {n_files} JPEGs under {root}")


# ---------------------------------------------------------------------------
# Reference full-loop run
# ---------------------------------------------------------------------------

def make_cfg():
    from dassl.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = tempfile.mkdtemp(prefix="e2e_dann_ref_")
    cfg.SEED = SEED
    cfg.USE_CUDA = False
    cfg.DATASET.ROOT = FIXTURE_ROOT
    cfg.DATASET.NAME = "Office31"
    cfg.DATASET.SOURCE_DOMAINS = [SOURCE]
    cfg.DATASET.TARGET_DOMAINS = [TARGET]
    cfg.INPUT.SIZE = (SIZE, SIZE)
    cfg.INPUT.INTERPOLATION = "bilinear"
    cfg.INPUT.TRANSFORMS = ("normalize",)
    cfg.DATALOADER.TRAIN_X.SAMPLER = "SequentialSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
    cfg.DATALOADER.TRAIN_U.SAME_AS_X = True
    cfg.DATALOADER.TEST.BATCH_SIZE = BATCH
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = ""
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = BASE_LR
    cfg.OPTIM.WEIGHT_DECAY = WD
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (STEP_SIZE,)
    cfg.OPTIM.GAMMA = GAMMA
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
    cfg.TRAINER.NAME = "DANN"
    cfg.TRAIN.PRINT_FREQ = 1
    return cfg


def build_ref_trainer(torch, cfg):
    import random

    from dassl.engine import build_trainer

    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    trainer = build_trainer(cfg)
    # intent shim: the fork's SimpleTrainer.model_inference passes label=
    # to SimpleNet.forward which doesn't accept it (docstring)
    trainer.model_inference = (
        lambda input, scale_no=0, label=None: trainer.model(input)
    )
    return trainer


def run_loop(torch, trainer):
    loss_x_l, loss_d_l, acc_l, lrs = [], [], [], []
    bx_labels, bu_domains, bu_sizes = [], [], []
    orig_fb = trainer.forward_backward

    def rec_fb(batch_x, batch_u):
        lrs.append(trainer.get_current_lr())
        bx_labels.append(batch_x["label"].numpy().copy())
        bu_domains.append(batch_u["domain"].numpy().copy())
        bu_sizes.append(int(batch_u["img"].shape[0]))
        out = orig_fb(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_d_l.append(out["loss_d"])
        acc_l.append(out["acc_x"])
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

    trainer.train()

    names = [n for b in impaths_box for n in b]
    lg = np.concatenate(logits, 0)
    lb = np.concatenate(labels_t, 0)
    order = np.argsort(np.asarray(names))
    return {
        "loss_x": loss_x_l, "loss_d": loss_d_l, "accs": acc_l, "lrs": lrs,
        "bx_labels": bx_labels, "bu_domains": bu_domains,
        "bu_sizes": bu_sizes,
        "names": [names[i] for i in order],
        "logits": lg[order], "labels": lb[order], "results": results_box,
    }


def run_reference():
    from tools._reference_harness import install

    torch = install(".")
    from tools._tv_mini import install_tv_mini

    install_tv_mini()

    cfg = make_cfg()
    trainer = build_ref_trainer(torch, cfg)
    assert len(trainer.train_loader_x) == 2    # COUNT_ITER basis
    assert len(trainer.train_loader_u) == 1    # exhausts mid-epoch: cycles
    dump(trainer, "init")
    r = run_loop(torch, trainer)
    dump(trainer, "final")
    shutil.rmtree(cfg.OUTPUT_DIR, ignore_errors=True)

    top2 = np.sort(r["logits"], axis=1)
    margin = float((top2[:, -1] - top2[:, -2]).min())
    assert margin > 1e-3, f"degenerate argmax margin {margin}; reseed"

    # 1e-6-perturbation probe (batch order is deterministic on both sides
    # here — SequentialSampler — so init chaos is the only divergence mode)
    cfgB = make_cfg()
    trainerB = build_ref_trainer(torch, cfgB)
    with torch.no_grad():
        trainerB.model.classifier.bias.add_(1e-6)
        trainerB.critic[1].bias.add_(1e-6)
    rB = run_loop(torch, trainerB)
    shutil.rmtree(cfgB.OUTPUT_DIR, ignore_errors=True)
    sens = max(
        max(abs(a - b) for a, b in zip(r["loss_x"], rB["loss_x"])),
        max(abs(a - b) for a, b in zip(r["loss_d"], rB["loss_d"])),
    )
    eval_sens = float(np.abs(r["logits"] - rB["logits"]).max())
    print(f"self-sensitivity: loss={sens:.3g} eval={eval_sens:.3g}")
    assert sens < SENS_BUDGET, (
        f"lr {BASE_LR} is chaotic here: self-sensitivity {sens}; lower LR"
    )

    data.update(
        self_sensitivity=np.float64(sens),
        eval_sensitivity=np.float64(eval_sens),
        loss_x=np.asarray(r["loss_x"], np.float64),
        loss_d=np.asarray(r["loss_d"], np.float64),
        accs=np.asarray(r["accs"], np.float64),
        lrs=np.asarray(r["lrs"], np.float64),
        batch_x_labels=np.stack(r["bx_labels"]).astype(np.int32),
        batch_u_domains=np.stack(r["bu_domains"]).astype(np.int32),
        batch_u_sizes=np.asarray(r["bu_sizes"], np.int32),
        test_names=np.asarray(r["names"]),
        test_logits=r["logits"].astype(np.float64),
        test_labels=r["labels"].astype(np.int32),
        test_preds=r["logits"].argmax(1).astype(np.int32),
        results=np.asarray(
            [r["results"]["accuracy"], r["results"]["error_rate"],
             r["results"]["macro_f1"]], np.float64,
        ),
        optim_scalars=np.asarray(
            [BASE_LR, CONS_LR, WD, STEP_SIZE, GAMMA], np.float64
        ),
        margin=np.float64(margin),
    )
    np.savez_compressed(GOLDEN, **data)
    print("loss_x:", r["loss_x"])
    print("loss_d:", r["loss_d"])
    print("accs:", r["accs"])
    print("lrs:", r["lrs"])
    print("results:", r["results"], "margin:", margin)


if __name__ == "__main__":
    build_dataset_fixture()
    run_reference()
    print("wrote", GOLDEN)
