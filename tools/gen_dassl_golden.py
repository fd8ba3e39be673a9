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

All weight arrays are stored under OUR flax paths ('/'-joined) so the
test transplants without a mapping table.
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


def dump_wrn(prefix):
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
dump_wrn("wrn_after")
wrn.eval()
data["wrn_feats_eval"] = t2np(wrn(torch.from_numpy(wx1)))

np.savez_compressed(OUT, **data)
print(f"wrote {OUT}: {len(data)} arrays")
