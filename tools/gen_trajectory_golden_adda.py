"""Generate tests/fixtures/trajectory_adda_golden.npz: an N-step training
trajectory of the REFERENCE Dassl ADDA trainer (torch CPU).

Pins the adversarial-discriminative scheduling against the real
``dassl/engine/da/adda.py:57-85`` ``forward_backward``: the FROZEN
source model runs in EVAL mode on the labeled batch (running-statistic
BN — distinct semantics worth pinning), the target model in train mode
on the unlabeled batch (one BN-advancing forward per step), the critic
updated on BCE(source feats -> 1, detached target feats -> 0), then the
target model updated to fool the UPDATED critic (whose train-mode
forward advances critic BN a third time) — with the classifier frozen
via ``open_specified_layers(["backbone", "head"])`` (torch skips
requires_grad=False params entirely, so no weight decay reaches it) —
two adam optimizers + constant-warmup->cosine schedulers.

3 epochs x 2 (batch_x, batch_u) pairs = 6 steps on SimpleNet
``cnn_digitsdg`` + BN-bearing ``mlp`` head; the critic is the shared
``build_critic`` mlp (Linear-BN-LeakyReLU x2 + scalar logit, dumped under
OUR Critic paths like tools/gen_trajectory_golden_dann.py). The source
model is the init-time deepcopy, so transplanting the init params on our
side reproduces it. Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_adda.py
"""

import copy
import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402
import torch.nn as nn  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.da.adda import ADDA  # noqa: E402

OUT = "tests/fixtures/trajectory_adda_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, CONS_LR, WD = 1e-4, 1e-5, 5e-4

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
cfg.OPTIM.NAME = "adam"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "constant"
cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = ADDA.__new__(ADDA)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.open_layers = ["backbone", "head"]
trainer.source_model = copy.deepcopy(trainer.model)
trainer.source_model.eval()
for param in trainer.source_model.parameters():
    param.requires_grad_(False)
ADDA.build_critic(trainer)
trainer.bce = nn.BCEWithLogitsLoss()
trainer.set_model_mode("train")
trainer.source_model.eval()  # set_model_mode flips registered models only

critic_body = trainer.critic[0].mlp
critic_head = trainer.critic[1]


def dump_model(model, prefix):
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


def dump_critic(prefix):
    # mlp = [Linear, BN, LeakyReLU] x2; fc0 consumes the HEAD output (64
    # features, no flatten permutation)
    for i, off in enumerate((0, 3)):
        fc, bn = critic_body[off], critic_body[off + 1]
        data[f"{prefix}/c/params/fc{i}/kernel"] = t2np(fc.weight).T.copy()
        data[f"{prefix}/c/params/fc{i}/bias"] = t2np(fc.bias)
        data[f"{prefix}/c/params/bn{i}/scale"] = t2np(bn.weight)
        data[f"{prefix}/c/params/bn{i}/bias"] = t2np(bn.bias)
        data[f"{prefix}/c/batch_stats/bn{i}/mean"] = t2np(bn.running_mean)
        data[f"{prefix}/c/batch_stats/bn{i}/var"] = t2np(bn.running_var)
    data[f"{prefix}/c/params/logit/kernel"] = t2np(critic_head.weight).T.copy()
    data[f"{prefix}/c/params/logit/bias"] = t2np(critic_head.bias)


dump_model(trainer.model, "init/m")  # the source model is this same copy
dump_critic("init")

rng = np.random.default_rng(59)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray([BASE_LR, CONS_LR, WD], np.float64),
)

loss_c_l, loss_m_l, lrs = [], [], []
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
        loss_c_l.append(out["loss_critic"])
        loss_m_l.append(out["loss_model"])
        step += 1

dump_model(trainer.model, "final/m")
dump_critic("final")
data.update(
    loss_critic=np.asarray(loss_c_l, np.float64),
    loss_model=np.asarray(loss_m_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

# the classifier must be EXACTLY frozen (open_specified_layers)
np.testing.assert_array_equal(
    data["final/m/params/classifier/kernel"],
    data["init/m/params/classifier/kernel"],
)

np.savez_compressed(OUT, **data)
print("loss_critic:", loss_c_l)
print("loss_model: ", loss_m_l)
print("lrs:        ", lrs)
print("wrote", OUT)
