"""Generate tests/fixtures/trajectory_mixmatch_golden.npz: an N-step
training trajectory of the REFERENCE Dassl MixMatch trainer (torch CPU),
with the per-step RANDOM DRAWS recorded for injection.

Pins the holistic-SSL scheduling against the real
``dassl/engine/ssl/mixmatch.py:28-87`` ``forward_backward``: no-grad
K-view pseudo-label guessing in train mode (BN advancing per view, in
view order), temperature sharpening, the joint [labeled; K*unlabeled]
shuffle, per-row Beta mixup with ``preserve_order`` (lam=max(lam,1-lam))
applied separately to the labeled and unlabeled halves, soft-CE +
weighted Brier loss through ONE backward, and the per-step
``linear_rampup`` weight — with SGD(momentum) + linear-warmup->cosine.

MixMatch is RNG-coupled (torch.randperm + Beta sampling), so the
generator wraps ``mixmatch.shuffle_index``/``mixmatch.mixup`` with
recording equivalents (same math, same torch RNG stream) and dumps the
permutation and post-preserve_order lambdas per step; the consuming test
drives our step function with those exact draws (the step takes
perm/lam_x/lam_u as arguments precisely for this).

3 epochs x 2 batches = 6 steps, K=2 views, on SimpleNet ``cnn_digitsdg``
+ BN-bearing ``mlp`` head. Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_mixmatch.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.ssl import mixmatch as mixmatch_mod  # noqa: E402

OUT = "tests/fixtures/trajectory_mixmatch_golden.npz"
N_CLS, BATCH, K = 4, 8, 2
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
WEIGHT_U, TEMP, BETA, RAMPUP = 10.0, 2.0, 0.75, 4

data = {}
rec = {"perm": [], "lam": []}  # lam appended x-half then u-half per step


def recording_shuffle_index(x, label):
    idx = torch.randperm(x.shape[0])
    rec["perm"].append(idx.numpy().copy())
    return x[idx], label[idx]


def recording_mixup(x1, x2, y1, y2, beta, preserve_order=False):
    lmda = torch.distributions.Beta(beta, beta).sample([x1.shape[0], 1, 1, 1])
    if preserve_order:
        lmda = torch.max(lmda, 1 - lmda)
    rec["lam"].append(lmda[:, 0, 0, 0].numpy().copy())
    xmix = x1 * lmda + x2 * (1 - lmda)
    lmda = lmda[:, :, 0, 0]
    ymix = y1 * lmda + y2 * (1 - lmda)
    return xmix, ymix


mixmatch_mod.shuffle_index = recording_shuffle_index
mixmatch_mod.mixup = recording_mixup


def t2np(t):
    # copy: .numpy() on fp32 CPU tensors SHARES storage with live params
    return t.detach().cpu().float().numpy().copy()


def conv_w(t):
    return np.ascontiguousarray(t2np(t).transpose(2, 3, 1, 0))


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
cfg.DATALOADER.K_TRANSFORMS = K
cfg.TRAINER.MIXMATCH.WEIGHT_U = WEIGHT_U
cfg.TRAINER.MIXMATCH.TEMP = TEMP
cfg.TRAINER.MIXMATCH.MIXUP_BETA = BETA
cfg.TRAINER.MIXMATCH.RAMPUP = RAMPUP
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
trainer = mixmatch_mod.MixMatch.__new__(mixmatch_mod.MixMatch)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.weight_u = WEIGHT_U
trainer.temp = TEMP
trainer.beta = BETA
trainer.rampup = RAMPUP
trainer.set_model_mode("train")


def dump(prefix):
    model = trainer.model
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


dump("init")

rng = np.random.default_rng(73)
# per step: labeled views [K, B] (only view 0 consumed), unlabeled [K, B]
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, K, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, WEIGHT_U, TEMP, BETA, RAMPUP, K],
        np.float64,
    ),
)

loss_x_l, loss_u_l, weight_l, lrs = [], [], [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        batch_x = {
            "img": [torch.from_numpy(imgs_x[i]),
                    torch.from_numpy(imgs_x[i])],
            "label": torch.from_numpy(labels_x[i]),
        }
        batch_u = {
            "img": [torch.from_numpy(imgs_u[i, v]) for v in range(K)],
            "label": torch.zeros(BATCH, dtype=torch.int64),
        }
        lrs.append(trainer.optim.param_groups[0]["lr"])
        global_step = b + epoch * BATCHES_PER_EPOCH
        weight_l.append(WEIGHT_U * min(max(global_step / RAMPUP, 0.0), 1.0))
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_u_l.append(out["loss_u"])
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    loss_u=np.asarray(loss_u_l, np.float64),
    weight_u=np.asarray(weight_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
    perms=np.stack(rec["perm"]).astype(np.int32),  # [steps, B + K*B]
    # lam draws: per step, x-half then u-half
    lams_x=np.stack(rec["lam"][0::2]),  # [steps, B]
    lams_u=np.stack(rec["lam"][1::2]),  # [steps, K*B]
)

assert len(rec["perm"]) == EPOCHS * BATCHES_PER_EPOCH
assert len(rec["lam"]) == 2 * EPOCHS * BATCHES_PER_EPOCH

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("loss_u:", loss_u_l)
print("weight:", weight_l)
print("lrs:   ", lrs)
print("wrote", OUT)
