"""Generate tests/fixtures/trajectory_domainmix_golden.npz: an N-step
training trajectory of the REFERENCE Dassl DomainMix trainer (torch CPU),
with the per-step RANDOM DRAWS recorded for injection.

Pins the crossdomain-mix scheduling against the real
``dassl/engine/dg/domain_mix.py:26-83``: the scalar Beta(alpha, beta)
lam, the base randperm OVERWRITTEN per domain with multinomial draws from
the OTHER domains (the data-dependent pairing surgery), the lam-blended
double-CE through one backward — with SGD(momentum) +
linear-warmup->cosine. DomainMix is RNG-coupled (rsample/randperm/
multinomial), so the generator swaps ``trainer.domain_mix`` for a
recording replica (same math, same torch RNG stream) and dumps lam, the
base perm, and the per-domain multinomial draws; the consuming test
replays them through OUR ``_domain_mix`` via a replay RNG, so the
product pairing logic itself is what runs.

3 epochs x 2 batches = 6 steps; 2 domains x split 4 = batch 8;
mix_type='crossdomain'. SimpleNet ``cnn_digitsdg`` + BN-bearing ``mlp``
head. Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_domainmix.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.dg.domain_mix import DomainMix  # noqa: E402

OUT = "tests/fixtures/trajectory_domainmix_golden.npz"
N_CLS, N_DOM, SPLIT = 4, 2, 4
BATCH = N_DOM * SPLIT
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
ALPHA, BETA_P = 1.0, 1.0

data = {}
rec = {"lam": [], "perm": [], "mn": []}  # mn: multinomial draws, in order


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
cfg.TRAINER.DOMAINMIX.TYPE = "crossdomain"
cfg.TRAINER.DOMAINMIX.ALPHA = ALPHA
cfg.TRAINER.DOMAINMIX.BETA = BETA_P
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
trainer = DomainMix.__new__(DomainMix)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.mix_type = "crossdomain"
trainer.alpha = ALPHA
trainer.beta = BETA_P
trainer.dist_beta = torch.distributions.Beta(ALPHA, BETA_P)
trainer.set_model_mode("train")


def recording_domain_mix(x, target, domain):
    # the reference body verbatim, with every draw recorded
    lam = (
        trainer.dist_beta.rsample((1,))
        if trainer.alpha > 0 else torch.tensor(1)
    ).to(x.device)
    rec["lam"].append(float(lam))
    perm = torch.randperm(x.size(0), dtype=torch.int64, device=x.device)
    rec["perm"].append(perm.numpy().copy())
    mn_this = []
    if trainer.mix_type == "crossdomain":
        domain_list = torch.unique(domain)
        if len(domain_list) > 1:
            for idx in domain_list:
                cnt_a = torch.sum(domain == idx)
                idx_b = (domain != idx).nonzero().squeeze(-1)
                cnt_b = idx_b.shape[0]
                perm_b = torch.ones(cnt_b).multinomial(
                    num_samples=cnt_a, replacement=bool(cnt_a > cnt_b)
                )
                mn_this.append(perm_b.numpy().copy())
                perm[domain == idx] = idx_b[perm_b]
    rec["mn"].append(np.stack(mn_this))
    mixed_x = lam * x + (1 - lam) * x[perm, :]
    target_a, target_b = target, target[perm]
    return mixed_x, target_a, target_b, lam


trainer.domain_mix = recording_domain_mix


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

rng = np.random.default_rng(79)
imgs = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
domains = np.repeat(np.arange(N_DOM), SPLIT)[None].repeat(2, 0).astype(np.int64)
data.update(
    imgs=imgs.astype(np.float16),
    labels=labels.astype(np.int32),
    domains=domains.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, MIN_LR, WD, MOMENTUM, ALPHA, BETA_P], np.float64
    ),
)

loss_l, lrs = [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        lrs.append(trainer.optim.param_groups[0]["lr"])
        out = trainer.forward_backward({
            "img": torch.from_numpy(imgs[i]),
            "label": torch.from_numpy(labels[i]),
            "domain": torch.from_numpy(domains[i]),
        })
        loss_l.append(out["loss"])
        step += 1

dump("final")
data.update(
    loss=np.asarray(loss_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
    lams=np.asarray(rec["lam"], np.float64),
    perms=np.stack(rec["perm"]).astype(np.int32),        # [steps, B]
    multinomials=np.stack(rec["mn"]).astype(np.int32),   # [steps, D, split]
)

np.savez_compressed(OUT, **data)
print("loss:", loss_l)
print("lams:", [round(v, 4) for v in rec["lam"]])
print("lrs: ", lrs)
print("wrote", OUT)
