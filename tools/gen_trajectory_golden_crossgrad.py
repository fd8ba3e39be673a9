"""Generate tests/fixtures/trajectory_crossgrad_golden.npz: an N-step
training trajectory of the REFERENCE Dassl CrossGrad trainer (torch CPU).

Pins the DG-family *input-gradient perturbation* scheduling: the actual
``dassl/engine/dg/crossgrad.py:43-80`` ``forward_backward`` — clipped
(+-0.1) input-gradients of each net's loss computed with TRAIN-mode
forwards (whose BN updates carry into the parameter steps), the
eps_f/eps_d cross-application quirk (input_d = x + EPS_F * grad_D;
input_f = x + EPS_D * grad_F — reference behavior, preserved), then F
updated on the (x, x_d) blend and D on the (x, x_f) blend — composed with
two torch ``Adam(amsgrad=True)`` optimizers (the reference's "amsgrad"
option, ``optimizer.py:96-103``) + constant-warmup->cosine schedulers.
This golden is the end-to-end witness for the torch-exact AMSGrad
transform (raw-moment max, bias-corrected after; see engine/optimizers.py
``scale_by_amsgrad_torch``).

3 epochs x 2 batches = 6 steps at lr 1e-4 (adam-family normalization is
sign-sensitive; the small lr keeps fp32 trajectories on the same branch).
F/D are SimpleNets with ``cnn_digitsdg`` + BN-bearing ``mlp`` heads; the
3 train-mode forwards of each net per step are part of the pin. Weights
dumped under OUR flax paths like tools/gen_trajectory_golden_ddaig.py.
Consumed by tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_crossgrad.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.dg.crossgrad import CrossGrad  # noqa: E402

OUT = "tests/fixtures/trajectory_crossgrad_golden.npz"
N_CLS, N_DOM, BATCH = 4, 2, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, CONS_LR, WD = 1e-4, 1e-5, 5e-4
EPS_F, EPS_D, ALPHA_F, ALPHA_D = 1.0, 1.0, 0.5, 0.25

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
cfg.TRAINER.CROSSGRAD.EPS_F = EPS_F
cfg.TRAINER.CROSSGRAD.EPS_D = EPS_D
cfg.TRAINER.CROSSGRAD.ALPHA_F = ALPHA_F
cfg.TRAINER.CROSSGRAD.ALPHA_D = ALPHA_D
cfg.OPTIM.NAME = "amsgrad"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "constant"
cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = CrossGrad.__new__(CrossGrad)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.num_source_domains = N_DOM
trainer.eps_f = EPS_F
trainer.eps_d = EPS_D
trainer.alpha_f = ALPHA_F
trainer.alpha_d = ALPHA_D
CrossGrad.build_model(trainer)
trainer.set_model_mode("train")


def dump_simplenet(model, prefix):
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


dump_simplenet(trainer.F, "init/F")
dump_simplenet(trainer.D, "init/D")

rng = np.random.default_rng(31)
imgs = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
domains = rng.integers(0, N_DOM, (2, BATCH)).astype(np.int64)
data.update(
    imgs=imgs.astype(np.float16),
    labels=labels.astype(np.int32),
    domains=domains.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, CONS_LR, WD, EPS_F, EPS_D, ALPHA_F, ALPHA_D], np.float64
    ),
)

loss_f_l, loss_d_l, lrs = [], [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    trainer.epoch = epoch
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        batch = {
            "img": torch.from_numpy(imgs[i]),
            "label": torch.from_numpy(labels[i]),
            "domain": torch.from_numpy(domains[i]),
        }
        lrs.append(trainer.optim_F.param_groups[0]["lr"])
        out = trainer.forward_backward(batch)
        loss_f_l.append(out["loss_f"])
        loss_d_l.append(out["loss_d"])
        step += 1

dump_simplenet(trainer.F, "final/F")
dump_simplenet(trainer.D, "final/D")
data.update(
    loss_f=np.asarray(loss_f_l, np.float64),
    loss_d=np.asarray(loss_d_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

np.savez_compressed(OUT, **data)
print("loss_f:", loss_f_l)
print("loss_d:", loss_d_l)
print("lrs:   ", lrs)
print("wrote", OUT)
