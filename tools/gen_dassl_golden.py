"""Generate tests/fixtures/dassl_golden.npz from the REFERENCE Dassl
modules (torch CPU, /root/reference/Dassl.pytorch — study-only source of
ground truth; requires the reference mount, run once from repo root):

A) `dd_*`: cnn_digitsdg backbone + Linear classifier, two supervised
   CE + SGD(lr=0.1, momentum=0.9, weight_decay=5e-4) steps — pins the
   whole supervised-step numerics chain (conv padding/pooling, CE, torch
   SGD semantics) of `engine/dassl_base.make_supervised_step`.
B) `wrn_*`: wide_resnet_16_4 — two train-mode forwards then an eval
   forward, with BN running stats recorded after each stage. Pins the
   WRN block wiring AND TorchBatchNorm's unbiased running-var update.
C) `rb_*`/`bo_*`: the torchvision-style ResNet BasicBlock / Bottleneck
   in isolation (stride placement, downsample wiring) — a full resnet18
   golden would be ~90 MB; the blocks pin the same semantics tiny.

All weight arrays are stored under OUR flax paths ('/'-joined) so the
test transplants without a mapping table; '*_after' dumps record stats
only (forwards never change params).
"""

import sys

sys.path.insert(0, "/root/reference/Dassl.pytorch")

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

from dassl.modeling import build_backbone

OUT = "tests/fixtures/dassl_golden.npz"
data = {}


def t2np(t):
    return t.detach().cpu().numpy().astype(np.float32)


def conv_w(t):  # torch [out,in,kh,kw] -> flax [kh,kw,in,out]
    return t2np(t).transpose(2, 3, 1, 0)


# --------------------------------------------------------------- A) digitsdg
torch.manual_seed(0)
rng = np.random.default_rng(0)
x1 = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
y1 = rng.integers(0, 4, 8).astype(np.int64)
x2 = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
y2 = rng.integers(0, 4, 8).astype(np.int64)
data.update(dd_x1=x1, dd_y1=y1, dd_x2=x2, dd_y2=y2)

bb = build_backbone("cnn_digitsdg")
fc = nn.Linear(256, 4)
bb.train()

# torch flattens NCHW [B,64,2,2] C-major; our NHWC flatten is (h,w,c)-major.
# Permute the classifier's input dim to OUR layout: flax_idx (h*2+w)*64+c
perm = np.array(
    [c * 4 + h * 2 + w for h in range(2) for w in range(2) for c in range(64)]
)


def dump_dd(prefix):
    for i in range(1, 5):
        conv = getattr(bb, f"conv{i}").conv
        data[f"{prefix}/backbone/conv{i}/kernel"] = conv_w(conv.weight)
        data[f"{prefix}/backbone/conv{i}/bias"] = t2np(conv.bias)
    data[f"{prefix}/classifier/kernel"] = t2np(fc.weight).T[perm]
    data[f"{prefix}/classifier/bias"] = t2np(fc.bias)


dump_dd("dd_init")

opt = torch.optim.SGD(
    list(bb.parameters()) + list(fc.parameters()),
    lr=0.1, momentum=0.9, weight_decay=5e-4,
)
logits1 = fc(bb(torch.from_numpy(x1)))
loss1 = TF.cross_entropy(logits1, torch.from_numpy(y1))
opt.zero_grad(); loss1.backward(); opt.step()
logits2 = fc(bb(torch.from_numpy(x2)))
loss2 = TF.cross_entropy(logits2, torch.from_numpy(y2))
opt.zero_grad(); loss2.backward(); opt.step()
data["dd_logits1"] = t2np(logits1)
data["dd_loss1"] = np.float32(loss1.item())
data["dd_loss2"] = np.float32(loss2.item())
dump_dd("dd_final")

# --------------------------------------------------------------- B) WRN-16-4
torch.manual_seed(1)
wrn = build_backbone("wide_resnet_16_4")
wx1 = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
wx2 = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
data.update(wrn_x1=wx1, wrn_x2=wx2)


def dump_wrn(prefix, stats_only=False):
    p, s = {}, {}
    p["conv1/kernel"] = conv_w(wrn.conv1.weight)
    for g in (1, 2, 3):
        layer = getattr(wrn, f"block{g}").layer
        for b, blk in enumerate(layer):
            base = f"block{g}_{b}"
            for bn_name in ("bn1", "bn2"):
                bn = getattr(blk, bn_name)
                p[f"{base}_{bn_name}/scale"] = t2np(bn.weight)
                p[f"{base}_{bn_name}/bias"] = t2np(bn.bias)
                s[f"{base}_{bn_name}/mean"] = t2np(bn.running_mean)
                s[f"{base}_{bn_name}/var"] = t2np(bn.running_var)
            p[f"{base}_conv1/kernel"] = conv_w(blk.conv1.weight)
            p[f"{base}_conv2/kernel"] = conv_w(blk.conv2.weight)
            if blk.convShortcut is not None:
                p[f"{base}_shortcut/kernel"] = conv_w(blk.convShortcut.weight)
    p["bn1/scale"] = t2np(wrn.bn1.weight)
    p["bn1/bias"] = t2np(wrn.bn1.bias)
    s["bn1/mean"] = t2np(wrn.bn1.running_mean)
    s["bn1/var"] = t2np(wrn.bn1.running_var)
    if not stats_only:  # forwards never change params — skip duplicates
        for k, v in p.items():
            data[f"{prefix}/params/{k}"] = v
    for k, v in s.items():
        data[f"{prefix}/stats/{k}"] = v


dump_wrn("wrn_init")
wrn.train()
f1 = wrn(torch.from_numpy(wx1))
f2 = wrn(torch.from_numpy(wx2))
data["wrn_feats1"] = t2np(f1)
data["wrn_feats2"] = t2np(f2)
dump_wrn("wrn_after", stats_only=True)
wrn.eval()
data["wrn_feats_eval"] = t2np(wrn(torch.from_numpy(wx1)))

# -------------------------------------------------- C) ResNet block wiring
# A full resnet18 golden would be ~90 MB of weights; the block modules in
# isolation pin the same semantics (stride placement, downsample wiring,
# BN behavior) at ~100 KB. BasicBlock 16->32 stride 2 + Bottleneck
# 32->16*4 stride 2, both with downsample, train + eval forwards.
from dassl.modeling.backbone.resnet import BasicBlock, Bottleneck

torch.manual_seed(2)


def dump_block(blk, prefix, has3, stats_only=False):
    convs = ["conv1", "conv2"] + (["conv3"] if has3 else [])
    bns = ["bn1", "bn2"] + (["bn3"] if has3 else [])
    if not stats_only:
        for c in convs:
            data[f"{prefix}/params/{c}/kernel"] = conv_w(
                getattr(blk, c).weight
            )
        data[f"{prefix}/params/downsample/kernel"] = conv_w(
            blk.downsample[0].weight
        )
    dbn = blk.downsample[1]
    if not stats_only:
        for b in bns:
            bn = getattr(blk, b)
            data[f"{prefix}/params/{b}/scale"] = t2np(bn.weight)
            data[f"{prefix}/params/{b}/bias"] = t2np(bn.bias)
        data[f"{prefix}/params/downsample_bn/scale"] = t2np(dbn.weight)
        data[f"{prefix}/params/downsample_bn/bias"] = t2np(dbn.bias)
    for b in bns:
        bn = getattr(blk, b)
        data[f"{prefix}/stats/{b}/mean"] = t2np(bn.running_mean)
        data[f"{prefix}/stats/{b}/var"] = t2np(bn.running_var)
    data[f"{prefix}/stats/downsample_bn/mean"] = t2np(dbn.running_mean)
    data[f"{prefix}/stats/downsample_bn/var"] = t2np(dbn.running_var)


bx = rng.standard_normal((4, 16, 12, 12)).astype(np.float32)
basic = BasicBlock(
    16, 32, stride=2,
    downsample=nn.Sequential(
        nn.Conv2d(16, 32, 1, stride=2, bias=False), nn.BatchNorm2d(32)
    ),
)
data["rb_x"] = bx
dump_block(basic, "rb_init", has3=False)
basic.train()
data["rb_train_out"] = t2np(basic(torch.from_numpy(bx)))
dump_block(basic, "rb_after", has3=False, stats_only=True)
basic.eval()
data["rb_eval_out"] = t2np(basic(torch.from_numpy(bx)))

bnx = rng.standard_normal((4, 32, 12, 12)).astype(np.float32)
bott = Bottleneck(
    32, 16, stride=2,
    downsample=nn.Sequential(
        nn.Conv2d(32, 64, 1, stride=2, bias=False), nn.BatchNorm2d(64)
    ),
)
data["bo_x"] = bnx
dump_block(bott, "bo_init", has3=True)
bott.train()
data["bo_train_out"] = t2np(bott(torch.from_numpy(bnx)))
dump_block(bott, "bo_after", has3=True, stats_only=True)
bott.eval()
data["bo_eval_out"] = t2np(bott(torch.from_numpy(bnx)))

# ------------------------------------------------ D) MMD / Sinkhorn ops
# deterministic distribution-distance ops golden'd directly against the
# reference modules (mmd.py, optimal_transport.py). "fast_euclidean" is
# used for the euclidean golden — the reference's "euclidean" branch
# calls the long-removed positional addmm_ overload (same math).
from dassl.modeling.ops import (
    MaximumMeanDiscrepancy,
    MinibatchEnergyDistance,
    SinkhornDivergence,
)

ox = rng.standard_normal((6, 10)).astype(np.float32)
oy = rng.standard_normal((7, 10)).astype(np.float32)
data["op_x"], data["op_y"] = ox, oy
tx, ty = torch.from_numpy(ox), torch.from_numpy(oy)
for kt in ("linear", "poly", "rbf"):
    data[f"op_mmd_{kt}"] = np.float32(
        MaximumMeanDiscrepancy(kernel_type=kt)(tx, ty).item()
    )
data["op_mmd_rbf_norm"] = np.float32(
    MaximumMeanDiscrepancy(kernel_type="rbf", normalize=True)(tx, ty).item()
)
for dm in ("cosine", "fast_euclidean"):
    data[f"op_sink_{dm}"] = np.float32(
        SinkhornDivergence(dist_metric=dm, eps=0.01, max_iter=5)(tx, ty).item()
    )
ox8 = rng.standard_normal((8, 10)).astype(np.float32)
oy8 = rng.standard_normal((8, 10)).astype(np.float32)
data["op_x8"], data["op_y8"] = ox8, oy8
data["op_med_cosine"] = np.float32(
    MinibatchEnergyDistance()(torch.from_numpy(ox8), torch.from_numpy(oy8))
    .item()
)

np.savez_compressed(OUT, **data)
print(f"wrote {OUT}: {len(data)} arrays")
