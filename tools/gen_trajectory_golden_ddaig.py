"""Generate tests/fixtures/trajectory_ddaig_golden.npz: an N-step training
trajectory of the REFERENCE Dassl DDAIG trainer (torch CPU).

Pins the DG-family *adversarial-generator* scheduling that per-op goldens
can't: the actual ``dassl/engine/dg/ddaig.py:54-104`` ``forward_backward``
— update G on CE(F(G(x))) - CE(D(G(x))) (both F/D forwards in TRAIN mode,
so their BN running stats advance during the G phase), re-perturb with the
UPDATED G under no_grad (+ clamp), update F on CE(F(x)) blended with
CE(F(x_p)) only past the WARMUP epoch (the branch flips inside this
trajectory), update D on CE(D(x), domain) — three independent
SGD(momentum) optimizers + constant-warmup->cosine schedulers stepped
together at epoch end. The generator is the real ``fcn_3x32_gctx``
(reflect-pad convs, affine-free instance norms -> conv-only params,
global-context fusion, tanh regression; ``ddaig_fcn.py:163-288``) — this
golden is also the only torch-parity evidence for that network's forward
AND backward.

3 epochs x 2 batches = 6 steps, WARMUP=1. F/D are SimpleNets with
``cnn_digitsdg`` + BN-bearing ``mlp`` heads (BN ordering across the
per-step F forwards — 2 during warmup, 3 after — is part of the pin).
Weights are dumped under OUR flax paths (head fc0 input permuted from
torch's C-major flatten to our NHWC flatten like tools/gen_dassl_golden.py;
FCN convs are plain [out,in,kh,kw] -> [kh,kw,in,out]). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_ddaig.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402
from dassl.engine.dg.ddaig import DDAIG  # noqa: E402

OUT = "tests/fixtures/trajectory_ddaig_golden.npz"
N_CLS, N_DOM, BATCH = 4, 2, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, CONS_LR, WD, MOMENTUM = 1e-3, 1e-5, 5e-4, 0.9
LMDA, ALPHA, WARMUP = 0.3, 0.5, 1
CLAMP, CLAMP_MIN, CLAMP_MAX = True, -2.0, 2.0

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
cfg.TRAINER.DDAIG.G_ARCH = "fcn_3x32_gctx"
cfg.TRAINER.DDAIG.LMDA = LMDA
cfg.TRAINER.DDAIG.ALPHA = ALPHA
cfg.TRAINER.DDAIG.WARMUP = WARMUP
cfg.TRAINER.DDAIG.CLAMP = CLAMP
cfg.TRAINER.DDAIG.CLAMP_MIN = CLAMP_MIN
cfg.TRAINER.DDAIG.CLAMP_MAX = CLAMP_MAX
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "constant"
cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = DDAIG.__new__(DDAIG)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
trainer.num_source_domains = N_DOM
trainer.lmda = LMDA
trainer.clamp = CLAMP
trainer.clamp_min = CLAMP_MIN
trainer.clamp_max = CLAMP_MAX
trainer.warmup = WARMUP
trainer.alpha = ALPHA
DDAIG.build_model(trainer)
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


def dump_fcn(g, prefix):
    # trunk: Sequential[ReflectionPad, Conv, InstanceNorm(affine=False),
    # ReLU, ResnetBlock x3] — instance norms carry no params
    data[f"{prefix}/params/conv0/kernel"] = conv_w(g.backbone[1].weight)
    for i in range(3):
        block = g.backbone[4 + i].conv_block
        # conv_block = [ReflectionPad, Conv, IN, ReLU, ReflectionPad, Conv, IN]
        data[f"{prefix}/params/block{i}/conv1/kernel"] = conv_w(block[1].weight)
        data[f"{prefix}/params/block{i}/conv2/kernel"] = conv_w(block[5].weight)
    data[f"{prefix}/params/gctx_fusion/kernel"] = conv_w(g.gctx_fusion[0].weight)
    data[f"{prefix}/params/regress/kernel"] = conv_w(g.regress[0].weight)
    data[f"{prefix}/params/regress/bias"] = t2np(g.regress[0].bias)


dump_simplenet(trainer.F, "init/F")
dump_simplenet(trainer.D, "init/D")
dump_fcn(trainer.G, "init/G")

rng = np.random.default_rng(29)
imgs = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
domains = rng.integers(0, N_DOM, (2, BATCH)).astype(np.int64)
data.update(
    imgs=imgs.astype(np.float16),
    labels=labels.astype(np.int32),
    domains=domains.astype(np.int32),
    optim_scalars=np.asarray(
        [BASE_LR, CONS_LR, WD, MOMENTUM, LMDA, ALPHA, WARMUP,
         CLAMP_MIN, CLAMP_MAX], np.float64
    ),
)

loss_g_l, loss_f_l, loss_d_l, lrs = [], [], [], []
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
        loss_g_l.append(out["loss_g"])
        loss_f_l.append(out["loss_f"])
        loss_d_l.append(out["loss_d"])
        step += 1

dump_simplenet(trainer.F, "final/F")
dump_simplenet(trainer.D, "final/D")
dump_fcn(trainer.G, "final/G")
data.update(
    loss_g=np.asarray(loss_g_l, np.float64),
    loss_f=np.asarray(loss_f_l, np.float64),
    loss_d=np.asarray(loss_d_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

np.savez_compressed(OUT, **data)
print("loss_g:", loss_g_l)
print("loss_f:", loss_f_l)
print("loss_d:", loss_d_l)
print("lrs:   ", lrs)
print("wrote", OUT)
