"""Generate tests/fixtures/trajectory_mt_golden.npz: an N-step training
trajectory of the REFERENCE Dassl MeanTeacher trainer (torch CPU).

Pins the EMA-teacher scheduling that per-op goldens can't: the actual
``dassl/engine/ssl/mean_teacher.py:27-54`` ``forward_backward`` — student
CE + MSE consistency to a train-mode teacher (whose forward advances the
TEACHER's own BN running stats; only parameters are EMA'd, reference
``ema_model_update`` iterates ``.parameters()``), the per-epoch
``sigmoid_rampup(epoch, rampup)`` weight, and the per-global-step
``min(1 - 1/(g+1), ema_alpha)`` EMA decay (EMA_ALPHA=0.8 puts the
crossover at g=4, inside the 6-step run, so BOTH regimes land in the
trajectory) — composed with the real Dassl RMSprop(momentum) +
linear-warmup->single_step scheduler. RMSprop makes this golden the
end-to-end witness for the eps-outside-the-root denominator
(torch ``optimizer.py:116-122``; see engine/optimizers.py).

3 epochs x 2 (batch_x, batch_u) pairs = 6 steps, SimpleNet with
``cnn_digitsdg`` + BN-bearing ``mlp`` head. Weights are dumped under OUR
flax paths (head fc0 input permuted torch-C-major -> our-NHWC like
tools/gen_dassl_golden.py); the teacher's params/batch_stats are dumped
too — its BN drift is part of the pin. Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_mt.py
"""

import copy
import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.ssl.mean_teacher import MeanTeacher  # noqa: E402

OUT = "tests/fixtures/trajectory_mt_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
# lr 1e-4, not 1e-3: the rmsprop+EMA-consistency composition is chaotic in
# fp32 at 1e-3 (a 1e-6 input perturbation moves the REFERENCE's own step-5
# loss by 1.9%); at 1e-4 its self-sensitivity is <=3e-6 across all 6 steps
# while loss_u still engages, so the pin stays tight and meaningful
BASE_LR, MIN_LR, WD, MOMENTUM, RMS_ALPHA = 1e-4, 1e-5, 5e-4, 0.9, 0.99
STEP_SIZE, GAMMA = 2, 0.1
WEIGHT_U, EMA_ALPHA, RAMPUP = 1.0, 0.8, 2

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
cfg.TRAINER.MEANTEACHER.WEIGHT_U = WEIGHT_U
cfg.TRAINER.MEANTEACHER.EMA_ALPHA = EMA_ALPHA
cfg.TRAINER.MEANTEACHER.RAMPUP = RAMPUP
cfg.OPTIM.NAME = "rmsprop"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.RMSPROP_ALPHA = RMS_ALPHA
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "single_step"
cfg.OPTIM.STEPSIZE = (STEP_SIZE,)
cfg.OPTIM.GAMMA = GAMMA
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "linear"
cfg.OPTIM.WARMUP_MIN_LR = MIN_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = MeanTeacher.__new__(MeanTeacher)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.weight_u = WEIGHT_U
trainer.ema_alpha = EMA_ALPHA
trainer.rampup = RAMPUP
trainer.teacher = copy.deepcopy(trainer.model)
trainer.teacher.train()
for param in trainer.teacher.parameters():
    param.requires_grad_(False)
trainer.set_model_mode("train")


def dump_net(model, prefix):
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
    data[f"{prefix}/params/classifier/kernel"] = t2np(model.classifier.weight).T.copy()
    data[f"{prefix}/params/classifier/bias"] = t2np(model.classifier.bias)


dump_net(trainer.model, "init/s")  # teacher starts as an exact copy

rng = np.random.default_rng(23)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, RMS_ALPHA, STEP_SIZE, GAMMA,
         WEIGHT_U, EMA_ALPHA, RAMPUP], np.float64
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
        lrs.append(trainer.optim.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_u_l.append(out["loss_u"])
        step += 1

dump_net(trainer.model, "final/s")
dump_net(trainer.teacher, "final/t")
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
