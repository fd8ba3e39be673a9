"""Generate tests/fixtures/trajectory_se_golden.npz: an N-step training
trajectory of the REFERENCE Dassl SE (self-ensembling) trainer (torch CPU).

Pins the SE scheduling against the real ``dassl/engine/da/se.py:30-65``
``forward_backward``: K_TRANSFORMS=2 target view pairs (student consumes
view 1, the train-mode EMA teacher view 2 — its BN advancing on its own
forwards), the CONF_THRE branch (teacher-confidence mask on the summed
squared error; the rampup branch never runs when the threshold is set),
``loss_x + loss_u`` through one backward, then the
``min(1 - 1/(g+1), ema_alpha)`` parameter EMA — with SGD(momentum) +
linear-warmup->cosine. EMA_ALPHA=0.8 puts the decay-cap crossover at
g=4, inside the 6-step run; CONF_THRE is tuned so the mask BINDS
(non-degenerate keep rates, asserted).

3 epochs x 2 batches = 6 steps on SimpleNet ``cnn_digitsdg`` + BN-bearing
``mlp`` head. torch batches carry LISTS of variant tensors
(batch_x["img"][0]; batch_u["img"] = [u1, u2]); our side's interleaved
[B*K] rows are emitted by the consuming test. Weights dumped under OUR
flax paths like tools/gen_trajectory_golden_mt.py (student 's', teacher
't'). Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_se.py
"""

import copy
import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.da.se import SE  # noqa: E402

OUT = "tests/fixtures/trajectory_se_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 1e-3, 1e-5, 5e-4, 0.9
EMA_ALPHA, CONF_THRE, RAMPUP = 0.8, 0.3, 5

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
cfg.TRAINER.SE.EMA_ALPHA = EMA_ALPHA
cfg.TRAINER.SE.CONF_THRE = CONF_THRE
cfg.TRAINER.SE.RAMPUP = RAMPUP
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "linear"
cfg.OPTIM.WARMUP_MIN_LR = MIN_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = SE.__new__(SE)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.ema_alpha = EMA_ALPHA
trainer.conf_thre = CONF_THRE
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

rng = np.random.default_rng(53)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u1 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u1=imgs_u1.astype(np.float16),
    imgs_u2=imgs_u2.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, EMA_ALPHA, CONF_THRE, RAMPUP],
        np.float64,
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
            "img": [torch.from_numpy(imgs_x[i]), torch.from_numpy(imgs_x[i])],
            "label": torch.from_numpy(labels_x[i]),
        }
        batch_u = {
            "img": [
                torch.from_numpy(imgs_u1[i]),
                torch.from_numpy(imgs_u2[i]),
            ],
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

assert any(lu > 1e-6 for lu in loss_u_l), (
    "confidence mask degenerate (loss_u all ~0); lower CONF_THRE"
)

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("loss_u:", loss_u_l)
print("lrs:   ", lrs)
print("wrote", OUT)
