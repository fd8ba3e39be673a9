"""Generate three small trajectory goldens: EntMin (on torch AdamW),
AdaBN (BN-statistics-only adaptation), and DAELDG (the DG ensemble).

- trajectory_entmin_golden.npz — the real ``dassl/engine/ssl/entmin.py``
  ``forward_backward`` (CE + lmda-weighted entropy of the unlabeled
  softmax, ONE backward through both terms) on torch ``AdamW`` — the
  end-to-end witness for the DECOUPLED weight-decay composition
  (``optimizer.py:105-112``) that no other golden exercises — with
  linear-warmup->cosine.
- trajectory_adabn_golden.npz — the real ``dassl/engine/da/adabn.py``:
  ``reset_running_stats()`` on the first ``before_epoch`` only, then
  no-grad train-mode target forwards re-estimating the BN statistics with
  NO parameter updates (params asserted bit-frozen). Pins the reset +
  momentum-blend trajectory.
- trajectory_daeldg_golden.npz — the real ``dassl/engine/dg/daeldg.py``
  ``forward_backward``: domain-grouped weak/strong views, per-domain
  expert CE + cross-expert consistency regularization (no unlabeled
  branch), one backward through F and the expert bank; SGD(momentum) +
  linear-warmup->cosine.

All on SimpleNet ``cnn_digitsdg`` + BN-bearing ``mlp`` head, dumped under
OUR flax paths (see tools/gen_trajectory_golden_fixmatch.py for the
layout and the fc0 flatten permutation). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_misc.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402

N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2

PERM = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)


def t2np(t):
    # copy: .numpy() on fp32 CPU tensors SHARES storage with live params
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


def base_cfg():
    cfg = get_cfg_default()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = 1e-5
    cfg.SEED = 1
    return cfg


def dump_simplenet(data, model, prefix, with_classifier=True):
    bb = model.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    fc0, bn0 = model.head.mlp[0], model.head.mlp[1]
    data[f"{prefix}/params/head/fc0/kernel"] = t2np(fc0.weight).T[PERM].copy()
    data[f"{prefix}/params/head/fc0/bias"] = t2np(fc0.bias)
    data[f"{prefix}/params/head/bn0/scale"] = t2np(bn0.weight)
    data[f"{prefix}/params/head/bn0/bias"] = t2np(bn0.bias)
    data[f"{prefix}/batch_stats/head/bn0/mean"] = t2np(bn0.running_mean)
    data[f"{prefix}/batch_stats/head/bn0/var"] = t2np(bn0.running_var)
    if with_classifier:
        data[f"{prefix}/params/classifier/kernel"] = t2np(
            model.classifier.weight
        ).T.copy()
        data[f"{prefix}/params/classifier/bias"] = t2np(model.classifier.bias)


# ---------------------------------------------------------------------------
# EntMin on AdamW
# ---------------------------------------------------------------------------

def gen_entmin():
    from dassl.engine.ssl.entmin import EntMin

    LMDA, LR, WD = 0.3, 3e-4, 5e-2  # large decoupled decay: the pin's point
    cfg = base_cfg()
    cfg.TRAINER.ENTMIN.LMDA = LMDA
    cfg.OPTIM.NAME = "adamw"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.WEIGHT_DECAY = WD

    torch.manual_seed(0)
    trainer = EntMin.__new__(EntMin)
    TrainerBase.__init__(trainer)
    trainer.cfg = cfg
    trainer.device = torch.device("cpu")
    trainer.num_classes = N_CLS
    SimpleTrainer.build_model(trainer)
    trainer.lmda = LMDA
    trainer.set_model_mode("train")

    data = {}
    dump_simplenet(data, trainer.model, "init")
    rng = np.random.default_rng(61)
    imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
    imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
    labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
    data.update(
        imgs_x=imgs_x.astype(np.float16), imgs_u=imgs_u.astype(np.float16),
        labels_x=labels_x.astype(np.int32),
        optim_scalars=np.asarray([LR, 1e-5, WD, LMDA], np.float64),
    )
    loss_x_l, loss_u_l, lrs = [], [], []
    trainer.num_batches = BATCHES_PER_EPOCH
    step = 0
    for epoch in range(EPOCHS):
        trainer.epoch = epoch
        for b in range(BATCHES_PER_EPOCH):
            trainer.batch_idx = b
            i = step % 2
            lrs.append(trainer.optim.param_groups[0]["lr"])
            out = trainer.forward_backward(
                {"img": torch.from_numpy(imgs_x[i]),
                 "label": torch.from_numpy(labels_x[i])},
                {"img": torch.from_numpy(imgs_u[i]),
                 "label": torch.zeros(BATCH, dtype=torch.int64)},
            )
            loss_x_l.append(out["loss_x"])
            loss_u_l.append(out["loss_u"])
            step += 1
    dump_simplenet(data, trainer.model, "final")
    data.update(
        loss_x=np.asarray(loss_x_l, np.float64),
        loss_u=np.asarray(loss_u_l, np.float64),
        lrs=np.asarray(lrs, np.float64),
    )
    np.savez_compressed("tests/fixtures/trajectory_entmin_golden.npz", **data)
    print("entmin loss_x:", loss_x_l)
    print("entmin loss_u:", loss_u_l)


# ---------------------------------------------------------------------------
# AdaBN
# ---------------------------------------------------------------------------

def gen_adabn():
    from dassl.engine.da.adabn import AdaBN

    cfg = base_cfg()
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 1e-3

    torch.manual_seed(0)
    trainer = AdaBN.__new__(AdaBN)
    TrainerBase.__init__(trainer)
    trainer.cfg = cfg
    trainer.device = torch.device("cpu")
    trainer.num_classes = N_CLS
    SimpleTrainer.build_model(trainer)
    trainer.done_reset_bn_stats = False
    trainer.set_model_mode("train")

    data = {}
    # warm the running stats so the FIRST before_epoch's reset is visible
    with torch.no_grad():
        warm = np.random.default_rng(3).standard_normal(
            (BATCH, 3, 32, 32)
        ).astype(np.float32)
        trainer.model(torch.from_numpy(warm))
    data["warm"] = warm.astype(np.float16)
    dump_simplenet(data, trainer.model, "init")  # warmed, pre-reset

    rng = np.random.default_rng(67)
    imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
    data["imgs_u"] = imgs_u.astype(np.float16)
    trainer.num_batches = BATCHES_PER_EPOCH
    step = 0
    for epoch in range(EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()  # resets BN stats ONCE (epoch 0 only)
        for b in range(BATCHES_PER_EPOCH):
            trainer.batch_idx = b
            i = step % 2
            trainer.forward_backward(
                {"img": torch.zeros(1)},  # unused by AdaBN
                {"img": torch.from_numpy(imgs_u[i]),
                 "label": torch.zeros(BATCH, dtype=torch.int64)},
            )
            step += 1
    dump_simplenet(data, trainer.model, "final")
    # params must be untouched (no optimizer step at all)
    np.testing.assert_array_equal(
        data["final/params/backbone/conv1/kernel"],
        data["init/params/backbone/conv1/kernel"],
    )
    np.savez_compressed("tests/fixtures/trajectory_adabn_golden.npz", **data)
    print("adabn final bn mean[:3]:",
          data["final/batch_stats/head/bn0/mean"][:3])


# ---------------------------------------------------------------------------
# DAELDG
# ---------------------------------------------------------------------------

def gen_daeldg():
    from dassl.engine.dg.daeldg import DAELDG

    N_DOM, SPLIT = 2, 4
    LR, WD, MOM = 3e-3, 5e-4, 0.9
    cfg = base_cfg()
    cfg.DATALOADER.TRAIN_X.N_DOMAIN = N_DOM
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = N_DOM * SPLIT
    cfg.TRAINER.DAELDG.CONF_THRE = 0.95  # read in __init__, unused in fwd
    cfg.TRAINER.DAELDG.STRONG_TRANSFORMS = ["random_flip"]
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOM
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = WD

    torch.manual_seed(0)
    trainer = DAELDG.__new__(DAELDG)
    TrainerBase.__init__(trainer)
    trainer.cfg = cfg
    trainer.device = torch.device("cpu")
    trainer.num_classes = N_CLS
    trainer.num_source_domains = N_DOM
    trainer.n_domain = N_DOM
    trainer.split_batch = SPLIT
    trainer.conf_thre = 0.95
    DAELDG.build_model(trainer)
    trainer.set_model_mode("train")

    data = {}
    dump_simplenet(data, trainer.F, "init/F", with_classifier=False)
    data["init/E/params/kernel"] = np.stack(
        [t2np(lin.weight).T for lin in trainer.E.linears]
    )
    data["init/E/params/bias"] = np.stack(
        [t2np(lin.bias) for lin in trainer.E.linears]
    )

    rng = np.random.default_rng(71)
    imgs = rng.standard_normal((2, N_DOM * SPLIT, 3, 32, 32)).astype(np.float16).astype(np.float32)
    imgs2 = rng.standard_normal((2, N_DOM * SPLIT, 3, 32, 32)).astype(np.float16).astype(np.float32)
    labels = rng.integers(0, N_CLS, (2, N_DOM * SPLIT)).astype(np.int64)
    domains = np.repeat(np.arange(N_DOM), SPLIT)[None].repeat(2, 0).astype(np.int64)
    data.update(
        imgs=imgs.astype(np.float16), imgs2=imgs2.astype(np.float16),
        labels=labels.astype(np.int32), domains=domains.astype(np.int32),
        optim_scalars=np.asarray([LR, 1e-5, WD, MOM], np.float64),
    )
    loss_x_l, loss_cr_l, lrs = [], [], []
    trainer.num_batches = BATCHES_PER_EPOCH
    step = 0
    for epoch in range(EPOCHS):
        trainer.epoch = epoch
        for b in range(BATCHES_PER_EPOCH):
            trainer.batch_idx = b
            i = step % 2
            lrs.append(trainer.optim_F.param_groups[0]["lr"])
            out = trainer.forward_backward({
                "img": torch.from_numpy(imgs[i]),
                "img2": torch.from_numpy(imgs2[i]),
                "label": torch.from_numpy(labels[i]),
                "domain": torch.from_numpy(domains[i]),
            })
            loss_x_l.append(out["loss_x"])
            loss_cr_l.append(out["loss_cr"])
            step += 1
    dump_simplenet(data, trainer.F, "final/F", with_classifier=False)
    data["final/E/params/kernel"] = np.stack(
        [t2np(lin.weight).T for lin in trainer.E.linears]
    )
    data["final/E/params/bias"] = np.stack(
        [t2np(lin.bias) for lin in trainer.E.linears]
    )
    data.update(
        loss_x=np.asarray(loss_x_l, np.float64),
        loss_cr=np.asarray(loss_cr_l, np.float64),
        lrs=np.asarray(lrs, np.float64),
    )
    np.savez_compressed("tests/fixtures/trajectory_daeldg_golden.npz", **data)
    print("daeldg loss_x: ", loss_x_l)
    print("daeldg loss_cr:", loss_cr_l)


# ---------------------------------------------------------------------------
# Vanilla (ERM) on RAdam
# ---------------------------------------------------------------------------

def gen_vanilla():
    """trajectory_vanilla_golden.npz — the real ``dg/vanilla.py`` ERM step
    on the vendored RAdam (``dassl/optim/radam.py`` — per-op pinned in
    test_optim_extra, end-to-end only here: the degenerated-to-SGD warmup
    steps and the N_sma>=5 rectified regime BOTH land inside 6 steps),
    with constant-warmup->cosine. Also the pin for the shared default
    supervised composition that SourceOnly/SupBaseline reuse verbatim."""
    from dassl.engine.dg.vanilla import Vanilla

    LR, WD = 1e-3, 5e-4
    cfg = base_cfg()
    cfg.OPTIM.NAME = "radam"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.WEIGHT_DECAY = WD
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 1e-5

    torch.manual_seed(0)
    trainer = Vanilla.__new__(Vanilla)
    TrainerBase.__init__(trainer)
    trainer.cfg = cfg
    trainer.device = torch.device("cpu")
    trainer.num_classes = N_CLS
    SimpleTrainer.build_model(trainer)
    trainer.set_model_mode("train")

    data = {}
    dump_simplenet(data, trainer.model, "init")
    rng = np.random.default_rng(83)
    imgs = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
    labels = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
    data.update(
        imgs=imgs.astype(np.float16), labels=labels.astype(np.int32),
        optim_scalars=np.asarray([LR, 1e-5, WD], np.float64),
    )
    loss_l, lrs = [], []
    trainer.num_batches = BATCHES_PER_EPOCH
    step = 0
    for epoch in range(EPOCHS):
        trainer.epoch = epoch
        for b in range(BATCHES_PER_EPOCH):
            trainer.batch_idx = b
            i = step % 2
            lrs.append(trainer.optim.param_groups[0]["lr"])
            out = trainer.forward_backward(
                {"img": torch.from_numpy(imgs[i]),
                 "label": torch.from_numpy(labels[i])}
            )
            loss_l.append(out["loss"])
            step += 1
    dump_simplenet(data, trainer.model, "final")
    data.update(
        loss=np.asarray(loss_l, np.float64),
        lrs=np.asarray(lrs, np.float64),
    )
    np.savez_compressed("tests/fixtures/trajectory_vanilla_golden.npz", **data)
    print("vanilla loss:", loss_l)


gen_entmin()
gen_adabn()
gen_daeldg()
gen_vanilla()
print("done")
