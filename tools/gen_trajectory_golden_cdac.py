"""Generate tests/fixtures/trajectory_cdac_golden.npz: an N-step training
trajectory of the REFERENCE Dassl CDAC trainer (torch CPU).

Pins the adaptive-clustering scheduling and its UNIQUE lr regime: the
actual ``dassl/engine/da/cdac.py:152-224`` ``forward_backward`` — two
backward rounds per step (supervised CE, then AAC + pseudo-label +
consistency on the target views), the top-k feature-index similarity
matrix, the p_thresh confidence mask, the per-ITERATION
``sigmoid_rampup(iter)`` consistency coefficient, and — unlike every
other trainer — the per-ITERATION LambdaLR annealing
``(1 + 10*iter/max_iter)^-0.75`` stepped by ``update_lr()`` inside
``forward_backward`` itself, with the classifier's base lr premultiplied
by CLASS_LR_MULTI (``cdac.py:100-138``). ``build_model`` runs UNMODIFIED
against a stub ``train_loader_x`` of the right length so the real
max_iter arithmetic is exercised.

3 epochs x 2 batches = 6 steps on SimpleNet ``cnn_digitsdg`` + BN-bearing
``mlp`` head + the temp-0.05 cosine ``Prototypes`` head (its kernel under
``C/params/prototypes/kernel``). K_TRANSFORMS=2 layouts: torch batches
carry LISTS of variant tensors (img[0]; img2[0], img2[1]); our side's
interleaved [B*K] rows are emitted by the consuming test. The recorded
per-step lr table IS the annealing pin. Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_cdac.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.da.cdac import CDAC, AAC  # noqa: E402

OUT = "tests/fixtures/trajectory_cdac_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
# lr 1e-4: the AAC gradient is 1/(1-P)-amplified at the temp-0.05
# softmax saturation, so larger lrs are gradient-space chaotic in fp32
# (at 3e-3 the 8-virtual-device harness's reduction order moves step-1
# loss by 1e-3 and flips the step-2 confidence mask; at 1e-4 the whole
# trajectory pins at rtol 5e-4)
BASE_LR, WD, MOMENTUM = 1e-4, 5e-4, 0.9
RAMPUP_COEF, RAMPUP_ITRS = 30.0, 4
# TOPK=1, not 2: rank-2/rank-3 feature gaps can be ~1e-6, so the top-2
# index SETS (and thus the discrete sim_mat) flip under reduction-order
# noise (the 8-virtual-device test harness threads XLA sums differently);
# argmax sets have O(1) margins and the set-equality machinery is still
# exercised
CLASS_LR_MULTI, TOPK, P_THRESH = 10.0, 1, 0.8

data = {}


def t2np(t):
    # the copy matters: .numpy() on an fp32 CPU tensor SHARES storage, so an
    # "init" dump would silently mutate as training proceeds
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):  # torch [out,in,kh,kw] -> flax [kh,kw,in,out]
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


# torch flattens the backbone's NCHW [B,64,2,2] C-major; our NHWC flatten is
# (h,w,c)-major — permute the head fc0 input dim (gen_dassl_golden.py:61-64)
PERM = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)

cfg = get_cfg_default()
cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
cfg.MODEL.HEAD.NAME = "mlp"
cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
cfg.MODEL.HEAD.ACTIVATION = "relu"
cfg.MODEL.HEAD.BN = True
cfg.MODEL.HEAD.DROPOUT = 0.0
cfg.DATALOADER.K_TRANSFORMS = 2
cfg.TRAINER.CDAC.RAMPUP_COEF = RAMPUP_COEF
cfg.TRAINER.CDAC.RAMPUP_ITRS = RAMPUP_ITRS
cfg.TRAINER.CDAC.CLASS_LR_MULTI = CLASS_LR_MULTI
cfg.TRAINER.CDAC.TOPK_MATCH = TOPK
cfg.TRAINER.CDAC.P_THRESH = P_THRESH
cfg.TRAINER.CDAC.STRONG_TRANSFORMS = ["random_flip"]
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.SEED = 1

torch.manual_seed(0)
trainer = CDAC.__new__(CDAC)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.max_epoch = EPOCHS
trainer.rampup_coef = RAMPUP_COEF
trainer.rampup_iters = RAMPUP_ITRS
trainer.lr_multi = CLASS_LR_MULTI
trainer.topk = TOPK
trainer.p_thresh = P_THRESH
trainer.aac_criterion = AAC()
# build_model sizes max_iter from len(train_loader_x) (COUNT_ITER default
# "smaller_one" min()s both loaders) — stub loaders of the right length so
# the REAL build_model and its LambdaLR wiring run unmodified
trainer.train_loader_x = [None] * BATCHES_PER_EPOCH
trainer.train_loader_u = [None] * BATCHES_PER_EPOCH
CDAC.build_model(trainer)
assert trainer.max_iter == EPOCHS * BATCHES_PER_EPOCH
trainer.set_model_mode("train")


def dump(prefix):
    model = trainer.F
    bb = model.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/F/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/F/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    fc0, bn0 = model.head.mlp[0], model.head.mlp[1]
    data[f"{prefix}/F/params/head/fc0/kernel"] = t2np(fc0.weight).T[PERM].copy()
    data[f"{prefix}/F/params/head/fc0/bias"] = t2np(fc0.bias)
    data[f"{prefix}/F/params/head/bn0/scale"] = t2np(bn0.weight)
    data[f"{prefix}/F/params/head/bn0/bias"] = t2np(bn0.bias)
    data[f"{prefix}/F/batch_stats/head/bn0/mean"] = t2np(bn0.running_mean)
    data[f"{prefix}/F/batch_stats/head/bn0/var"] = t2np(bn0.running_var)
    data[f"{prefix}/C/params/prototypes/kernel"] = t2np(
        trainer.C.prototypes.weight
    ).T.copy()


dump("init")

rng = np.random.default_rng(47)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_us = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_us2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
labels_u = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    imgs_us=imgs_us.astype(np.float16),
    imgs_us2=imgs_us2.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    labels_u=labels_u.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, WD, MOMENTUM, RAMPUP_COEF, RAMPUP_ITRS,
         CLASS_LR_MULTI, TOPK, P_THRESH], np.float64
    ),
)

loss_x_l, aac_l, pl_l, cons_l, keep_l = [], [], [], [], []
lrs_f, lrs_c = [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        batch_x = {
            # K_TRANSFORMS=2: lists of variant tensors; only [0] is used
            "img": [torch.from_numpy(imgs_x[i]), torch.from_numpy(imgs_x[i])],
            "label": torch.from_numpy(labels_x[i]),
        }
        batch_u = {
            "img": [torch.from_numpy(imgs_u[i]), torch.from_numpy(imgs_u[i])],
            "img2": [
                torch.from_numpy(imgs_us[i]),
                torch.from_numpy(imgs_us2[i]),
            ],
            "label": torch.from_numpy(labels_u[i]),
        }
        lrs_f.append(trainer.optim_F.param_groups[0]["lr"])
        lrs_c.append(trainer.optim_C.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        aac_l.append(out["aac_loss"])
        pl_l.append(out["pl_loss"])
        cons_l.append(out["cons_loss"])
        keep_l.append(float(out["p_u_pred_keep"]))
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    aac_loss=np.asarray(aac_l, np.float64),
    pl_loss=np.asarray(pl_l, np.float64),
    cons_loss=np.asarray(cons_l, np.float64),
    keep=np.asarray(keep_l, np.float64),
    lrs_f=np.asarray(lrs_f, np.float64),
    lrs_c=np.asarray(lrs_c, np.float64),
)

assert any(0.0 < k < 1.0 for k in keep_l), (
    f"confidence mask degenerate (keep={keep_l}); tune P_THRESH"
)

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("aac:   ", aac_l)
print("pl:    ", pl_l)
print("cons:  ", cons_l)
print("keep:  ", keep_l)
print("lrs_f: ", lrs_f)
print("lrs_c: ", lrs_c)
print("wrote", OUT)
