"""Generate tests/fixtures/trajectory_m3sda_golden.npz: an N-step training
trajectory of the REFERENCE Dassl M3SDA trainer (torch CPU).

Pins the multi-source moment-matching scheduling: the actual
``dassl/engine/da/m3sda.py:74-151`` ``forward_backward`` — step A
(per-DOMAIN F forwards so train-mode BN normalizes each source sub-batch
separately, per-domain pair-classifier CE averaged over domains, plus the
lmda-weighted first/second-moment pairwise distance to the target batch,
one optimizer step for F AND the classifier bank), step B (target forward
FIRST then per-domain no-grad source forwards — all still advancing F's
BN — classifiers maximize target discrepancy), step C (F minimizes
discrepancy N_STEP_F times) — with per-model SGD(momentum) + a
WARMUP-FREE cosine schedule (epoch 0 already at the cosine value).

3 epochs x 2 batches = 6 steps; 2 source domains x split 4 = batch 8.
F is a SimpleNet ``cnn_digitsdg`` + BN-bearing ``mlp`` head; the
(2+3+N_STEP_F) train-mode F forwards per step are part of the pin. The
per-domain PairClassifiers bank is dumped STACKED over domains to match
our ``StackedLinears`` layout (``C/params/c1/kernel`` [D, fdim, C],
``bias`` [D, C]; same for c2). Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_m3sda.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.da.m3sda import M3SDA  # noqa: E402

OUT = "tests/fixtures/trajectory_m3sda_golden.npz"
N_CLS, N_DOM, SPLIT = 4, 2, 4
BATCH = N_DOM * SPLIT
EPOCHS, BATCHES_PER_EPOCH = 3, 2
# lr 3e-4, not 3e-3: the moment-distance sqrt + discrepancy coupling is
# chaotic in fp32 at 3e-3 (a 1e-6 input perturbation moves the REFERENCE's
# own step-5 loss_step_A by 1.8%); at 3e-4 its self-sensitivity stays
# <=2.3e-5 across all 6 steps, so the pin stays tight and meaningful
BASE_LR, WD, MOMENTUM = 3e-4, 5e-4, 0.9
N_STEP_F, LMDA = 4, 0.5

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
cfg.DATALOADER.TRAIN_X.N_DOMAIN = N_DOM
cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
cfg.TRAINER.M3SDA.N_STEP_F = N_STEP_F
cfg.TRAINER.M3SDA.LMDA = LMDA
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 0  # warmup-free: epoch 0 is already on the cosine
cfg.SEED = 1

torch.manual_seed(0)
trainer = M3SDA.__new__(M3SDA)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.num_source_domains = N_DOM
trainer.n_domain = N_DOM
trainer.split_batch = SPLIT
trainer.n_step_F = N_STEP_F
trainer.lmda = LMDA
M3SDA.build_model(trainer)
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
    for cname in ("c1", "c2"):
        kern = np.stack(
            [t2np(getattr(trainer.C[d], cname).weight).T for d in range(N_DOM)]
        )
        bias = np.stack(
            [t2np(getattr(trainer.C[d], cname).bias) for d in range(N_DOM)]
        )
        data[f"{prefix}/C/params/{cname}/kernel"] = kern
        data[f"{prefix}/C/params/{cname}/bias"] = bias


dump("init")

rng = np.random.default_rng(41)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
# RandomDomainSampler contract: rows grouped [n_domain, split]
domains_x = np.repeat(np.arange(N_DOM), SPLIT)[None].repeat(2, 0).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    domains_x=domains_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, WD, MOMENTUM, N_STEP_F, LMDA], np.float64
    ),
)

loss_a_l, loss_b_l, loss_c_l, lrs = [], [], [], []
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
            "domain": torch.from_numpy(domains_x[i]),
        }
        batch_u = {
            "img": torch.from_numpy(imgs_u[i]),
            "label": torch.zeros(BATCH, dtype=torch.int64),
        }
        lrs.append(trainer.optim_F.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_a_l.append(out["loss_step_A"])
        loss_b_l.append(out["loss_step_B"])
        loss_c_l.append(out["loss_step_C"])
        step += 1

dump("final")
data.update(
    loss_step_A=np.asarray(loss_a_l, np.float64),
    loss_step_B=np.asarray(loss_b_l, np.float64),
    loss_step_C=np.asarray(loss_c_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

np.savez_compressed(OUT, **data)
print("loss_step_A:", loss_a_l)
print("loss_step_B:", loss_b_l)
print("loss_step_C:", loss_c_l)
print("lrs:        ", lrs)
print("wrote", OUT)
