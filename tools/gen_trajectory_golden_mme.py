"""Generate tests/fixtures/trajectory_mme_golden.npz: an N-step training
trajectory of the REFERENCE Dassl MME trainer (torch CPU).

Pins the minimax-entropy scheduling: the actual
``dassl/engine/da/mme.py:59-83`` ``forward_backward`` — TWO full
``model_backward_and_update`` rounds per step (supervised CE stepping
BOTH optimizers, then lmda-weighted NEGATIVE entropy through the GRL:
the prototype classifier descends it while F's gradients reverse at the
feature boundary), the temperature-0.05 cosine prototype classifier
(normalize -> bias-free linear / temp), and the second round consuming
the FIRST round's already-updated params and BN stats — composed with
two SGD(momentum) optimizers + constant-warmup->cosine schedulers.

3 epochs x 2 (batch_x, batch_u) pairs = 6 steps on SimpleNet
``cnn_digitsdg`` + BN-bearing ``mlp`` head (2 train-mode F forwards per
step; the ordering is part of the pin). Weights are dumped under OUR
flax paths like tools/gen_trajectory_golden_fixmatch.py; the prototype
kernel is ``C/params/prototypes/kernel`` [fdim, C]. Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_mme.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.da.mme import MME  # noqa: E402

OUT = "tests/fixtures/trajectory_mme_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, CONS_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
LMDA = 0.1

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
cfg.TRAINER.MME.LMDA = LMDA
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "constant"
cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = MME.__new__(MME)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.lmda = LMDA
MME.build_model(trainer)
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

rng = np.random.default_rng(37)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, CONS_LR, WD, MOMENTUM, LMDA], np.float64
    ),
)

loss_x_l, loss_u_l, lrs = [], [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        batch_x = {
            "img": torch.from_numpy(imgs_x[i]),
            "label": torch.from_numpy(labels_x[i]),
        }
        batch_u = {
            "img": torch.from_numpy(imgs_u[i]),
            "label": torch.zeros(BATCH, dtype=torch.int64),
        }
        lrs.append(trainer.optim_F.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_u_l.append(out["loss_u"])
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    loss_u=np.asarray(loss_u_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("loss_u:", loss_u_l)
print("lrs:   ", lrs)
print("wrote", OUT)
