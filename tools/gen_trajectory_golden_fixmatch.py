"""Generate tests/fixtures/trajectory_fixmatch_golden.npz: an N-step
training trajectory of the REFERENCE Dassl FixMatch trainer (torch CPU).

Pins the SSL-family update *scheduling* (VERDICT r4 item 8) that per-op
goldens can't: the actual ``dassl/engine/ssl/fixmatch.py:52-95``
``forward_backward`` — no-grad pseudo-label pass over [labeled;unlabeled]
weak views (which still advances BN running stats), confidence-masked
unlabeled CE over the strong views, ``loss_x + weight_u * loss_u``,
``model_backward_and_update`` — composed with the real Dassl SGD(momentum)
+ linear-warmup->cosine scheduler stepping per epoch, on a SimpleNet with
``cnn_digitsdg`` backbone + a BN-bearing ``mlp`` head (so the BN
running-stat ordering across the THREE train-mode forwards inside one step
is part of the pin).

3 epochs x 2 (batch_x, batch_u) pairs = 6 steps. Weights are dumped under
OUR flax paths ('/'-joined, head fc0 input permuted from torch's C-major
flatten to our NHWC flatten like tools/gen_dassl_golden.py). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_fixmatch.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import install  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import SimpleTrainer, TrainerBase  # noqa: E402
from dassl.engine.ssl.fixmatch import FixMatch  # noqa: E402

OUT = "tests/fixtures/trajectory_fixmatch_golden.npz"
N_CLS, BATCH = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 2
BASE_LR, MIN_LR, WD, MOMENTUM = 3e-3, 1e-5, 5e-4, 0.9
WEIGHT_U, CONF_THRE = 1.0, 0.27

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
cfg.TRAINER.FIXMATCH.WEIGHT_U = WEIGHT_U
cfg.TRAINER.FIXMATCH.CONF_THRE = CONF_THRE
cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS = ["random_flip"]
cfg.OPTIM.NAME = "sgd"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.MOMENTUM = MOMENTUM
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.SGD_NESTEROV = False
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "linear"
cfg.OPTIM.WARMUP_MIN_LR = MIN_LR
cfg.SEED = 1

torch.manual_seed(0)
trainer = FixMatch.__new__(FixMatch)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")
trainer.num_classes = N_CLS
SimpleTrainer.build_model(trainer)
trainer.weight_u = WEIGHT_U
trainer.conf_thre = CONF_THRE
trainer.set_model_mode("train")

model = trainer.model


def dump(prefix):
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

rng = np.random.default_rng(11)
imgs_x = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_x2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
imgs_u2 = rng.standard_normal((2, BATCH, 3, 32, 32)).astype(np.float16).astype(np.float32)
labels_x = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
labels_u = rng.integers(0, N_CLS, (2, BATCH)).astype(np.int64)
data.update(
    imgs_x=imgs_x.astype(np.float16),
    imgs_x2=imgs_x2.astype(np.float16),
    imgs_u=imgs_u.astype(np.float16),
    imgs_u2=imgs_u2.astype(np.float16),
    labels_x=labels_x.astype(np.int32),
    labels_u=labels_u.astype(np.int32),
    optim_scalars=np.asarray([BASE_LR, MIN_LR, WD, MOMENTUM, WEIGHT_U, CONF_THRE], np.float64),
)

loss_x_l, loss_u_l, keep_l, lrs = [], [], [], []
trainer.num_batches = BATCHES_PER_EPOCH
step = 0
for epoch in range(EPOCHS):
    for b in range(BATCHES_PER_EPOCH):
        trainer.batch_idx = b
        i = step % 2
        batch_x = {
            "img": torch.from_numpy(imgs_x[i]),
            "img2": torch.from_numpy(imgs_x2[i]),
            "label": torch.from_numpy(labels_x[i]),
        }
        batch_u = {
            "img": torch.from_numpy(imgs_u[i]),
            "img2": torch.from_numpy(imgs_u2[i]),
            "label": torch.from_numpy(labels_u[i]),
        }
        lrs.append(trainer.optim.param_groups[0]["lr"])
        out = trainer.forward_backward(batch_x, batch_u)
        loss_x_l.append(out["loss_x"])
        loss_u_l.append(out["loss_u"])
        keep_l.append(float(out["y_u_pred_keep"]))
        step += 1

dump("final")
data.update(
    loss_x=np.asarray(loss_x_l, np.float64),
    loss_u=np.asarray(loss_u_l, np.float64),
    keep=np.asarray(keep_l, np.float64),
    lrs=np.asarray(lrs, np.float64),
)

assert any(0.0 < k < 1.0 for k in keep_l), (
    f"confidence mask degenerate (keep={keep_l}); tune CONF_THRE"
)

np.savez_compressed(OUT, **data)
print("loss_x:", loss_x_l)
print("loss_u:", loss_u_l)
print("keep:  ", keep_l)
print("lrs:   ", lrs)
print("wrote", OUT)
