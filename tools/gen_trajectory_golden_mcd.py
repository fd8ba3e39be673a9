"""Generate tests/fixtures/trajectory_mcd_golden.npz: an N-step training
trajectory of the REFERENCE Dassl MCD trainer (torch CPU).

Pins the DA-family *three-phase alternating* update scheduling that per-op
goldens can't: the actual ``dassl/engine/da/mcd.py:50-98``
``forward_backward`` — step A (F+C1+C2 on source CE, ONE optimizer step
each), step B (C1/C2 maximize L1 discrepancy on target with F frozen via
``torch.no_grad`` — which still advances F's BN running stats), step C
(F minimizes discrepancy ``N_STEP_F`` times, each its own fwd+bwd+step,
BN advancing every iteration) — composed with the real Dassl
SGD(momentum, nesterov) per-model optimizers + linear-warmup->cosine
schedulers (``update_lr`` steps all three at epoch end). The BN ordering
across the 1+2+N_STEP_F train-mode forwards of F inside one step is part
of the pin (BN-bearing ``mlp`` head on F, like the FixMatch golden).

3 epochs x 2 (batch_x, batch_u) pairs = 6 steps. Weights are dumped under
OUR flax paths ('/'-joined; head fc0 input permuted from torch's C-major
flatten to our NHWC flatten like tools/gen_dassl_golden.py; C1/C2 consume
the head output so no permutation applies to them). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_mcd.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.da.mcd import MCD  # noqa: E402

OUT = "tests/fixtures/trajectory_mcd_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
N_STEP_F = 4

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
cfg.TRAINER.MCD.N_STEP_F = N_STEP_F
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = True  # pins the nesterov trace composition too
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "linear"
cfg.OPTIM.WARMUP_MIN_LR = MIN_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = MCD.__new__(MCD)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.n_step_F = N_STEP_F
MCD.build_model(trainer)
trainer.set_model_mode("train")

netF, c1, c2 = trainer.F, trainer.C1, trainer.C2


def dump(prefix):
    bb = netF.backbone
    for i in (1, 2, 3, 4):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/F/params/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/F/params/backbone/conv{i}/bias"] = t2np(conv.bias)
    fc0, bn0 = netF.head.mlp[0], netF.head.mlp[1]
    data[f"{prefix}/F/params/head/fc0/kernel"] = t2np(fc0.weight).T[PERM].copy()
    data[f"{prefix}/F/params/head/fc0/bias"] = t2np(fc0.bias)
    data[f"{prefix}/F/params/head/bn0/scale"] = t2np(bn0.weight)
    data[f"{prefix}/F/params/head/bn0/bias"] = t2np(bn0.bias)
    data[f"{prefix}/F/batch_stats/head/bn0/mean"] = t2np(bn0.running_mean)
    data[f"{prefix}/F/batch_stats/head/bn0/var"] = t2np(bn0.running_var)
    for name, lin in (("C1", c1), ("C2", c2)):
        data[f"{prefix}/{name}/params/fc/kernel"] = t2np(lin.weight).T.copy()
        data[f"{prefix}/{name}/params/fc/bias"] = t2np(lin.bias)


dump("init")

rng = np.random.default_rng(17)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, N_STEP_F], np.float64
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
