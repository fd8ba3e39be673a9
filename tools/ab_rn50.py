"""Controlled interleaved A/B on RN50 eval (batch 256, bf16): the shipped
NCHW/OIHW path vs an NHWC/HWIO layout vs inference-BN folding (towers are
frozen, so BN is pure per-channel affine and folds into the conv weights).

Four variants isolate the two effects:
  nchw        — shipped `encode_image_resnet` (models/resnet.py)
  nchw_fold   — shipped layout, BN pre-folded into conv weight + bias
  nhwc        — same math, NHWC activations / HWIO kernels
  nhwc_fold   — NHWC + folded BN

Run from the repo root on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("AB_RN50_CPU"):
    # sitecustomize force-selects the axon TPU platform; env vars alone
    # do not switch platforms here (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import resnet as rn
from ovmr_tpu.ops.layers import l2_normalize

cfg = jclip.RN50
key = jax.random.PRNGKey(0)
batch = int(os.environ.get("AB_RN50_BATCH", "256"))
dtype = dict(bf16=jnp.bfloat16, fp32=jnp.float32)[
    os.environ.get("AB_RN50_DTYPE", "bf16")
]

visual = rn.init_resnet_visual(key, cfg, dtype=dtype)
# zero-init bn3 gammas make half the residual branches dead code under
# folding — randomize all BN stats/affines so every conv survives
leaves = []


def _randomize_bn(tree, k):
    if isinstance(tree, list):
        for item in tree:
            k = _randomize_bn(item, k)
        return k
    for v in tree.values():
        if isinstance(v, dict):
            if "mean" in v:  # a BN param group
                k, *ks = jax.random.split(k, 5)
                c = v["mean"].shape[0]
                v["scale"] = (1.0 + 0.1 * jax.random.normal(ks[0], (c,))).astype(dtype)
                v["bias"] = (0.1 * jax.random.normal(ks[1], (c,))).astype(dtype)
                v["mean"] = 0.1 * jax.random.normal(ks[2], (c,))
                v["var"] = 1.0 + 0.5 * jax.random.uniform(ks[3], (c,))
            else:
                k = _randomize_bn(v, k)
        elif isinstance(v, list):
            k = _randomize_bn(v, k)
    return k


_randomize_bn(visual, jax.random.PRNGKey(7))
params = {"visual": visual}
images = jax.random.normal(key, (batch, 3, 224, 224), dtype)
classifier = l2_normalize(
    jax.random.normal(key, (1000, cfg.embed_dim), jnp.float32)
)

EPS = 1e-5


def fold_conv_bn(w, bn):
    """(conv, inference-BN) -> (scaled conv, bias). OIHW out-channel axis 0."""
    inv = np.asarray(bn["var"], np.float32)
    inv = np.asarray(bn["scale"], np.float32) / np.sqrt(inv + EPS)
    w32 = np.asarray(w, np.float32) * inv[:, None, None, None]
    b32 = np.asarray(bn["bias"], np.float32) - np.asarray(bn["mean"], np.float32) * inv
    return w32, b32


def fold_tree(visual):
    """Pre-fold every conv+BN pair; weights stay OIHW fp32 here."""
    out = {"attnpool": visual["attnpool"]}
    stem = visual["stem"]
    out["stem"] = {}
    for i in (1, 2, 3):
        w, b = fold_conv_bn(stem[f"conv{i}_w"], stem[f"bn{i}"])
        out["stem"][f"conv{i}_w"] = w
        out["stem"][f"conv{i}_b"] = b
    out["stages"] = []
    for stage in visual["stages"]:
        so = []
        for blk in stage:
            bo = {}
            for i in (1, 2, 3):
                w, b = fold_conv_bn(blk[f"conv{i}_w"], blk[f"bn{i}"])
                bo[f"conv{i}_w"] = w
                bo[f"conv{i}_b"] = b
            if "down_conv_w" in blk:
                w, b = fold_conv_bn(blk["down_conv_w"], blk["down_bn"])
                bo["down_conv_w"] = w
                bo["down_conv_b"] = b
            so.append(bo)
        out["stages"].append(so)
    return out


def to_nhwc(tree):
    """OIHW kernels -> HWIO (for the NHWC variants)."""
    def cv(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))

    out = {"attnpool": tree["attnpool"], "stem": {}, "stages": []}
    for k, v in tree["stem"].items():
        out["stem"][k] = cv(v) if k.endswith("_w") else v
    for stage in tree["stages"]:
        so = []
        for blk in stage:
            bo = {}
            for k, v in blk.items():
                bo[k] = cv(v) if k.endswith("conv_w") or (k.startswith("conv") and k.endswith("_w")) else v
            so.append(bo)
        out["stages"].append(so)
    return out


# ---- folded forward, layout-parametric ------------------------------------


def conv2d_lay(x, w, stride, padding, nhwc):
    dn = ("NHWC", "HWIO", "NHWC") if nhwc else ("NCHW", "OIHW", "NCHW")
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def bias_add(y, b, nhwc):
    b = b.astype(jnp.float32)
    return y + (b if nhwc else b[:, None, None])


def avg_pool_lay(x, window, nhwc):
    win = (1, window, window, 1) if nhwc else (1, 1, window, window)
    return jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, win, win, "VALID"
    ).astype(x.dtype) / (window * window)


def conv_bias_relu(x, p, name, stride, padding, nhwc, relu=True):
    y = bias_add(conv2d_lay(x, p[name + "_w"], stride, padding, nhwc),
                 p[name + "_b"], nhwc)
    y = jax.nn.relu(y) if relu else y
    return y.astype(x.dtype)


def folded_forward(params, imgs, nhwc):
    v = params["visual"]
    x = imgs
    if nhwc:
        x = jnp.transpose(x, (0, 2, 3, 1))
    x = x.astype(dtype)
    x = conv_bias_relu(x, v["stem"], "conv1", 2, 1, nhwc)
    x = conv_bias_relu(x, v["stem"], "conv2", 1, 1, nhwc)
    x = conv_bias_relu(x, v["stem"], "conv3", 1, 1, nhwc)
    x = avg_pool_lay(x, 2, nhwc)
    for si, stage in enumerate(v["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            out = conv_bias_relu(x, blk, "conv1", 1, 0, nhwc)
            out = conv_bias_relu(out, blk, "conv2", 1, 1, nhwc)
            if stride > 1:
                out = avg_pool_lay(out, stride, nhwc)
            out = conv_bias_relu(out, blk, "conv3", 1, 0, nhwc, relu=False)
            identity = x
            if "down_conv_w" in blk:
                if stride > 1:
                    identity = avg_pool_lay(identity, stride, nhwc)
                identity = conv_bias_relu(identity, blk, "down_conv", 1, 0,
                                          nhwc, relu=False)
            x = jax.nn.relu(out.astype(jnp.float32)
                            + identity.astype(jnp.float32)).astype(dtype)
    if nhwc:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return rn.attention_pool(x, v["attnpool"], cfg.vision_heads)


# ---- plain (unfolded) NHWC forward ----------------------------------------


def bn_lay(x, p, nhwc):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + EPS)
    s = inv * p["scale"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    m = p["mean"].astype(jnp.float32)
    if not nhwc:
        s, b, m = (t[:, None, None] for t in (s, b, m))
    return ((xf - m) * s + b).astype(x.dtype)


def plain_forward_nhwc(params, imgs):
    v = params["visual"]
    x = jnp.transpose(imgs, (0, 2, 3, 1)).astype(dtype)

    def cbr(x, w, bn, stride=1, padding=0, relu=True):
        y = conv2d_lay(x, w, stride, padding, True).astype(x.dtype)
        y = bn_lay(y, bn, True)
        return jax.nn.relu(y) if relu else y

    st = v["stem"]
    x = cbr(x, st["conv1_w"], st["bn1"], 2, 1)
    x = cbr(x, st["conv2_w"], st["bn2"], 1, 1)
    x = cbr(x, st["conv3_w"], st["bn3"], 1, 1)
    x = avg_pool_lay(x, 2, True)
    for si, stage in enumerate(v["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            out = cbr(x, blk["conv1_w"], blk["bn1"])
            out = cbr(out, blk["conv2_w"], blk["bn2"], 1, 1)
            if stride > 1:
                out = avg_pool_lay(out, stride, True)
            out = cbr(out, blk["conv3_w"], blk["bn3"], relu=False)
            identity = x
            if "down_conv_w" in blk:
                if stride > 1:
                    identity = avg_pool_lay(identity, stride, True)
                identity = cbr(identity, blk["down_conv_w"], blk["down_bn"],
                               relu=False)
            x = jax.nn.relu(out + identity)
    x = jnp.transpose(x, (0, 3, 1, 2))
    return rn.attention_pool(x, v["attnpool"], cfg.vision_heads)


def head(feats, cls):
    f = l2_normalize(feats).astype(jnp.float32)
    return jnp.sum(jnp.argmax(100.0 * f @ cls.T, -1))


params_fold = {"visual": fold_tree(visual)}
params_nhwc = {"visual": to_nhwc(visual)}
params_nhwc_fold = {"visual": to_nhwc(params_fold["visual"])}
# cast folded/transposed weights to the compute dtype once, like the
# shipped param tree
params_fold = jax.tree.map(
    lambda a: jnp.asarray(a, dtype) if np.asarray(a).ndim >= 1 else a, params_fold
)
params_nhwc = jax.tree.map(
    lambda a: jnp.asarray(np.asarray(a), dtype)
    if np.asarray(a).dtype != np.float32 or np.asarray(a).ndim == 4
    else jnp.asarray(a), params_nhwc
)
params_nhwc_fold = jax.tree.map(
    lambda a: jnp.asarray(a, dtype) if np.asarray(a).ndim >= 1 else a,
    params_nhwc_fold,
)

VARIANTS = {
    "nchw": jax.jit(lambda p, x, c: head(
        rn.encode_image_resnet(p, x, cfg.vision_heads), c)),
    "nchw_fold": jax.jit(lambda p, x, c: head(folded_forward(p, x, False), c)),
    "nhwc": jax.jit(lambda p, x, c: head(plain_forward_nhwc(p, x), c)),
    "nhwc_fold": jax.jit(lambda p, x, c: head(folded_forward(p, x, True), c)),
}
PARAMS = {
    "nchw": params,
    "nchw_fold": params_fold,
    "nhwc": params_nhwc,
    "nhwc_fold": params_nhwc_fold,
}

if "--check" in sys.argv:
    # numerics: compare raw features across variants (run on CPU with
    # AB_RN50_DTYPE=fp32 AB_RN50_BATCH=2 before trusting chip timings)
    FEATS = {
        "nchw": jax.jit(lambda p, x: rn.encode_image_resnet(
            p, x, cfg.vision_heads)),
        "nchw_fold": jax.jit(lambda p, x: folded_forward(p, x, False)),
        "nhwc": jax.jit(lambda p, x: plain_forward_nhwc(p, x)),
        "nhwc_fold": jax.jit(lambda p, x: folded_forward(p, x, True)),
    }
    base = np.asarray(FEATS["nchw"](PARAMS["nchw"], images), np.float32)
    for name in ("nchw_fold", "nhwc", "nhwc_fold"):
        got = np.asarray(FEATS[name](PARAMS[name], images), np.float32)
        err = np.max(np.abs(got - base)) / (np.max(np.abs(base)) + 1e-9)
        print(f"{name}: max rel err vs nchw = {err:.2e}")
        assert err < (5e-5 if dtype == jnp.float32 else 3e-2), name
    print("CHECK OK")
    sys.exit(0)

ref = None
for name, fn in list(VARIANTS.items()):
    try:
        t0 = time.perf_counter()
        val = float(fn(PARAMS[name], images, classifier))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s value={val}",
              flush=True)
        if ref is None:
            ref = val
        elif abs(val - ref) > batch * 2:
            print(f"  WARNING: {name} argmax-sum far from ref: {val} vs {ref}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        del VARIANTS[name]

best = {name: float("inf") for name in VARIANTS}
for rnd in range(3):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = [fn(PARAMS[name], images, classifier) for _ in range(6)]
        _ = np.asarray(jnp.stack(out))
        ms = (time.perf_counter() - t0) / 6 * 1e3
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms", flush=True)

print("\n=== best (ms/batch, img/s) ===")
for name, ms in best.items():
    print(f"{name}: {ms:.1f} ms  {batch/(ms/1e3):.0f} img/s")
