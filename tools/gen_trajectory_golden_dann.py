"""Generate tests/fixtures/trajectory_dann_golden.npz: an N-step training
trajectory of the REFERENCE Dassl DANN trainer (torch CPU).

Pins the DA-family *adversarial* update scheduling: the actual
``dassl/engine/da/dann.py:45-77`` ``forward_backward`` — GRL with the
per-global-step annealed lambda ``2/(1+exp(-10*progress))-1``, BCE domain
critic (BN-bearing mlp body, so critic BN stats are part of the pin),
``loss_x + loss_d`` through ``model_backward_and_update`` which steps BOTH
registered optimizers — composed with the real Dassl adam +
constant-warmup -> single_step scheduler (``update_lr`` steps both
schedulers at epoch end). 4 epochs x 2 batches = 8 steps, so the lambda
ramp, the warmup handoff AND a single_step decay all land inside the
trajectory.

Weights are dumped under OUR flax paths. The backbone's flattened
features feed BOTH the classifier and the critic's fc0, so the torch
C-major -> our NHWC flatten permutation applies to both input dims
(tools/gen_dassl_golden.py:61-64). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_dann.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402
import torch.nn as nn  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.da.dann import DANN  # noqa: E402

OUT = "tests/fixtures/trajectory_dann_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 4, 2
BASE_LR, CONS_LR, WD = 1e-3, 1e-5, 5e-4
STEP_SIZE, GAMMA = 2, 0.1

data = {}


def t2np(t):
    # copy: .numpy() on an fp32 CPU tensor SHARES storage with the live
    # params, so pre-training dumps would mutate as training proceeds
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


PERM = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)

cfg = get_cfg_default()
cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
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
cfg.SEED = 1

torch.manual_seed(0)
trainer = DANN.__new__(DANN)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.max_epoch = EPOCHS
SimpleTrainer.build_model(trainer)
trainer.build_critic()
trainer.ce = nn.CrossEntropyLoss()
trainer.bce = nn.BCEWithLogitsLoss()
trainer.set_model_mode("train")

model, critic = trainer.model, trainer.critic
critic_body = critic[0].mlp  # [Linear, BN, LeakyReLU] x 2
critic_head = critic[1]


def dump(prefix):
    bb = model.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/m/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/m/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    data[f"{prefix}/m/params/classifier/kernel"] = (
        t2np(model.classifier.weight).T[PERM].copy()
    )
    data[f"{prefix}/m/params/classifier/bias"] = t2np(model.classifier.bias)
    for i, off in enumerate((0, 3)):  # mlp indices of the two Linears
        fc, bn = critic_body[off], critic_body[off + 1]
        kern = t2np(fc.weight).T
        if i == 0:  # fc0 consumes the backbone's flattened features
            kern = kern[PERM].copy()
        data[f"{prefix}/c/params/fc{i}/kernel"] = kern
        data[f"{prefix}/c/params/fc{i}/bias"] = t2np(fc.bias)
        data[f"{prefix}/c/params/bn{i}/scale"] = t2np(bn.weight)
        data[f"{prefix}/c/params/bn{i}/bias"] = t2np(bn.bias)
        data[f"{prefix}/c/batch_stats/bn{i}/mean"] = t2np(bn.running_mean)
        data[f"{prefix}/c/batch_stats/bn{i}/var"] = t2np(bn.running_var)
    data[f"{prefix}/c/params/logit/kernel"] = t2np(critic_head.weight).T.copy()
    data[f"{prefix}/c/params/logit/bias"] = t2np(critic_head.bias)


dump("init")

rng = np.random.default_rng(13)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, CONS_LR, WD, STEP_SIZE, GAMMA], np.float64
    ),
)

loss_x_l, loss_d_l, lmda_l, lrs = [], [], [], []
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
        lrs.append(trainer.optim.param_groups[0]["lr"])
        global_step = b + epoch * BATCHES_PER_EPOCH
        progress = global_step / (EPOCHS * BATCHES_PER_EPOCH)
        lmda_l.append(2 / (1 + np.exp(-10 * progress)) - 1)
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_d_l.append(out["loss_d"])
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    loss_d=np.asarray(loss_d_l, np.float64),
    lmda=np.asarray(lmda_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("loss_d:", loss_d_l)
print("lmda:  ", [round(v, 4) for v in lmda_l])
print("lrs:   ", lrs)
print("wrote", OUT)
