"""Generate tests/fixtures/trajectory_dael_golden.npz: an N-step training
trajectory of the REFERENCE Dassl DAEL trainer (torch CPU).

Pins the domain-adaptive-ensemble scheduling — the most composite DA
update: the actual ``dassl/engine/da/dael.py:89-181`` ``forward_backward``
— no-grad pseudo-label pass (most-confident-expert argmax over the expert
bank, confidence mask, F's BN advancing), then the grad forwards in the
reference order (ALL weak source views per domain, ALL strong source
views, strong target view), per-domain expert CE on weak views,
consistency regularization of the OTHER experts' mean strong-view
prediction against the detached own-expert label, masked pseudo-label CE
on the strong target view, ONE backward through F and the whole expert
bank — with SGD(momentum) + linear-warmup->cosine schedulers.

3 epochs x 2 batches = 6 steps; 2 source domains x split 4 = batch 8.
F is a SimpleNet ``cnn_digitsdg`` + BN-bearing ``mlp`` head (the
1+2+2+1 train-mode forwards per step are part of the pin). The expert
bank is dumped STACKED over domains to match our ``StackedLinears``
layout (``E/params/kernel`` [K, fdim, C], ``bias`` [K, C]). CONF_THRE is
tuned so the confidence mask is non-degenerate (asserted). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_dael.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.da.dael import DAEL  # noqa: E402

OUT = "tests/fixtures/trajectory_dael_golden.npz"
N_CLS, N_DOM, SPLIT = 4, 2, 4
BATCH = N_DOM * SPLIT
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
WEIGHT_U, CONF_THRE = 0.5, 0.4

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
cfg.TRAINER.DAEL.WEIGHT_U = WEIGHT_U
cfg.TRAINER.DAEL.CONF_THRE = CONF_THRE
cfg.TRAINER.DAEL.STRONG_TRANSFORMS = ["random_flip"]
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
trainer = DAEL.__new__(DAEL)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.num_source_domains = N_DOM
trainer.n_domain = N_DOM
trainer.split_batch = SPLIT
trainer.weight_u = WEIGHT_U
trainer.conf_thre = CONF_THRE
DAEL.build_model(trainer)
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
    kern = np.stack(
        [t2np(lin.weight).T for lin in trainer.E.linears]
    )
    bias = np.stack([t2np(lin.bias) for lin in trainer.E.linears])
    data[f"{prefix}/E/params/kernel"] = kern
    data[f"{prefix}/E/params/bias"] = bias


dump("init")

rng = np.random.default_rng(43)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_x2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
# RandomDomainSampler contract: rows grouped [n_domain, split]
domains_x = np.repeat(np.arange(N_DOM), SPLIT)[None].repeat(2, 0).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_x2=imgs_x2.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    imgs_u2=imgs_u2.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    domains_x=domains_x.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, WEIGHT_U, CONF_THRE], np.float64
    ),
)

loss_x_l, loss_cr_l, loss_u_l, keep_l, lrs = [], [], [], [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2

        # replicate the pseudo-label block to record the mask keep rate
        # (forward_backward doesn't expose it). Probe in EVAL mode so the
        # probe forward does NOT advance BN running stats — the real step
        # must see untouched state.
        trainer.F.eval()
        with torch.no_grad():
            feat_probe = trainer.F(torch.from_numpy(imgs_u[i]))
            preds = torch.stack(
                [trainer.E(k, feat_probe) for k in range(N_DOM)], 1
            )
            keep = (
                (preds.max(2)[0].max(1)[0] >= CONF_THRE).float().mean().item()
            )
        trainer.F.train()
        keep_l.append(keep)

        batch_x = {
            "img": torch.from_numpy(imgs_x[i]),
            "img2": torch.from_numpy(imgs_x2[i]),
            "label": torch.from_numpy(labels_x[i]),
            "domain": torch.from_numpy(domains_x[i]),
        }
        batch_u = {
            "img": torch.from_numpy(imgs_u[i]),
            "img2": torch.from_numpy(imgs_u2[i]),
            "label": torch.zeros(BATCH, dtype=torch.int64),
        }
        lrs.append(trainer.optim_F.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_cr_l.append(out["loss_cr"])
        loss_u_l.append(out["loss_u"])
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    loss_cr=np.asarray(loss_cr_l, np.float64),
    loss_u=np.asarray(loss_u_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

# the BN-stat probe above ran in EVAL mode (running stats untouched), but
# the reference's real pseudo pass runs in TRAIN mode — the keep list is
# diagnostic only. Require a non-degenerate mask somewhere in the run.
assert any(0.0 < k < 1.0 for k in keep_l) or (
    0.0 < min(keep_l) <= max(keep_l) < 1.0
), f"confidence mask degenerate (keep={keep_l}); tune CONF_THRE"
assert any(lu > 0 for lu in loss_u_l), "loss_u never fired"

np.savez_compressed(OUT, **data)
print("loss_x: ", loss_x_l)
print("loss_cr:", loss_cr_l)
print("loss_u: ", loss_u_l)
print("keep~:  ", keep_l)
print("lrs:    ", lrs)
print("wrote", OUT)
