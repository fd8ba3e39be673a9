"""ModifiedResNet CLIP image tower (RN50 / RN101 / RN50xN backbones).

Functional JAX re-implementation of the reference ``clip/model.py:10-150``:

- 3-conv stem with BatchNorm (inference statistics; these towers are always
  frozen here) and a trailing 2x2 average pool;
- anti-aliased strided Bottlenecks: stride-2 stages do avgpool-then-conv;
- the final pooling is QKV attention over spatial tokens with a prepended
  mean token (``AttentionPool2d``, separate q/k/v/c projections).

Layout: NCHW activations, OIHW conv kernels (matching the torch
checkpoints; XLA re-layouts internally for the MXU).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def batch_norm(x, p, eps: float = 1e-5):
    """Inference-mode BN in fp32 (towers are frozen)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (xf - p["mean"].astype(jnp.float32)[None, :, None, None]) * (
        inv * p["scale"].astype(jnp.float32)
    )[None, :, None, None] + p["bias"].astype(jnp.float32)[None, :, None, None]
    return out.astype(x.dtype)


def avg_pool(x, window: int):
    return jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, 1, window, window),
        (1, 1, window, window),
        "VALID",
    ).astype(x.dtype) / (window * window)


def bottleneck(x, p, stride: int):
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2_w"], padding=1), p["bn2"]))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(conv2d(out, p["conv3_w"]), p["bn3"])

    identity = x
    if "down_conv_w" in p:
        identity = x
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity = batch_norm(conv2d(identity, p["down_conv_w"]), p["down_bn"])
    return jax.nn.relu(out + identity)


def attention_pool(x, p, n_head: int):
    """[B, C, H, W] -> [B, output_dim] (reference ``AttentionPool2d``).

    Off-native resolutions (a feature map whose H*W differs from the
    trained ``spacial_dim``^2) bilinear-resize the positional table to
    the map's grid — same adaptation as the ViT towers' resize_pos_embed;
    identity at the native size."""
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).transpose(0, 2, 1)  # [B, HW, C]
    tokens = jnp.concatenate(
        [tokens.mean(axis=1, keepdims=True), tokens], axis=1
    )  # [B, HW+1, C]
    pe = p["positional_embedding"]
    grid = round((pe.shape[0] - 1) ** 0.5)
    # guard on the GRID SHAPE, not the token count: an equal-area
    # non-square map (e.g. 4x1 vs the trained 2x2) must resize too
    if (h, w) != (grid, grid):
        from ovmr_tpu.models.clip import resize_pos_embed

        pe = resize_pos_embed(pe, grid, h, w)
    tokens = tokens + pe.astype(tokens.dtype)[None]

    def proj(t, name):
        return (
            jnp.dot(
                t, p[f"{name}_w"].astype(t.dtype), preferred_element_type=jnp.float32
            )
            + p[f"{name}_b"].astype(jnp.float32)
        ).astype(t.dtype)

    # torch computes attention with the mean token as the only used query;
    # restrict the query to token 0 (identical output, less work)
    q = proj(tokens[:, :1], "q")  # [B, 1, C]
    k = proj(tokens, "k")
    v = proj(tokens, "v")

    l = tokens.shape[1]
    dh = c // n_head
    qh = q.reshape(b, 1, n_head, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, n_head, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, l, n_head, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * dh**-0.5, kh, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return (
        jnp.dot(out, p["c_w"].astype(out.dtype), preferred_element_type=jnp.float32)
        + p["c_b"].astype(jnp.float32)
    ).astype(x.dtype)


def encode_image_resnet(params: dict, images: jax.Array, n_head: int) -> jax.Array:
    v = params["visual"]
    x = images.astype(v["stem"]["conv1_w"].dtype)
    stem = v["stem"]
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv1_w"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv2_w"], padding=1), stem["bn2"]))
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv3_w"], padding=1), stem["bn3"]))
    x = avg_pool(x, 2)
    for stage_idx, stage in enumerate(v["stages"]):
        for block_idx, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = bottleneck(x, block, stride)
    return attention_pool(x, v["attnpool"], n_head)


# --------------------------------------------------------------------------
# random init (name-based smoke builds; checkpoints use the importer below)
# --------------------------------------------------------------------------


def init_resnet_visual(key, cfg, dtype=jnp.float32) -> dict:
    """Shape-correct random visual tree for a named RN backbone with no
    checkpoint (zero-egress smoke runs). Matches the reference's ResNet
    init semantics where it specifies them (``clip/model.py:773-788``:
    attnpool projections ~ N(0, C^-0.5), every bottleneck's bn3 gamma
    zeroed); conv kernels use fan-in-scaled normals standing in for
    torch's default kaiming."""
    width = cfg.vision_width
    embed_c = width * 32
    keys = iter(jax.random.split(key, 256))

    def conv(out_c, in_c, k):
        fan_in = in_c * k * k
        return (
            jax.random.normal(next(keys), (out_c, in_c, k, k)) * fan_in**-0.5
        ).astype(dtype)

    def bn(c, zero_scale=False):
        return {
            "scale": jnp.zeros((c,), dtype) if zero_scale else jnp.ones((c,), dtype),
            "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }

    stem = {
        "conv1_w": conv(width // 2, 3, 3),
        "bn1": bn(width // 2),
        "conv2_w": conv(width // 2, width // 2, 3),
        "bn2": bn(width // 2),
        "conv3_w": conv(width, width // 2, 3),
        "bn3": bn(width),
    }
    stages = []
    inplanes = width
    for stage_i, n_blocks in enumerate(cfg.vision_layers):
        planes = width * (2**stage_i)
        stage = []
        for b in range(n_blocks):
            block = {
                "conv1_w": conv(planes, inplanes, 1),
                "bn1": bn(planes),
                "conv2_w": conv(planes, planes, 3),
                "bn2": bn(planes),
                "conv3_w": conv(planes * 4, planes, 1),
                "bn3": bn(planes * 4, zero_scale=True),
            }
            if b == 0:
                block["down_conv_w"] = conv(planes * 4, inplanes, 1)
                block["down_bn"] = bn(planes * 4)
            stage.append(block)
            inplanes = planes * 4
        stages.append(stage)

    spatial = cfg.image_resolution // 32
    std = embed_c**-0.5
    attnpool = {
        "positional_embedding": (
            jax.random.normal(next(keys), (spatial * spatial + 1, embed_c)) * std
        ).astype(dtype),
    }
    for name, out_c in (("q", embed_c), ("k", embed_c), ("v", embed_c),
                        ("c", cfg.embed_dim)):
        attnpool[f"{name}_w"] = (
            jax.random.normal(next(keys), (embed_c, out_c)) * std
        ).astype(dtype)
        attnpool[f"{name}_b"] = jnp.zeros((out_c,), dtype)
    return {"stem": stem, "stages": stages, "attnpool": attnpool}


# --------------------------------------------------------------------------
# torch import
# --------------------------------------------------------------------------

def _bn(sd, prefix, t):
    return {
        "scale": t(sd[prefix + ".weight"]),
        "bias": t(sd[prefix + ".bias"]),
        "mean": t(sd[prefix + ".running_mean"]),
        "var": t(sd[prefix + ".running_var"]),
    }


def resnet_visual_from_state_dict(sd: Dict, t) -> Tuple[dict, dict]:
    """Convert ``visual.*`` keys of a ResNet CLIP state_dict.
    `t` converts a torch tensor / array-like to fp32 numpy.
    Returns (visual_params, meta) with meta = {layers, width, heads, output_dim, image_resolution}."""
    stem = {
        "conv1_w": t(sd["visual.conv1.weight"]),
        "bn1": _bn(sd, "visual.bn1", t),
        "conv2_w": t(sd["visual.conv2.weight"]),
        "bn2": _bn(sd, "visual.bn2", t),
        "conv3_w": t(sd["visual.conv3.weight"]),
        "bn3": _bn(sd, "visual.bn3", t),
    }
    counts = [
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
        for b in (1, 2, 3, 4)
    ]
    stages = []
    for stage_i, n_blocks in enumerate(counts, start=1):
        stage = []
        for b in range(n_blocks):
            pre = f"visual.layer{stage_i}.{b}"
            block = {
                "conv1_w": t(sd[pre + ".conv1.weight"]),
                "bn1": _bn(sd, pre + ".bn1", t),
                "conv2_w": t(sd[pre + ".conv2.weight"]),
                "bn2": _bn(sd, pre + ".bn2", t),
                "conv3_w": t(sd[pre + ".conv3.weight"]),
                "bn3": _bn(sd, pre + ".bn3", t),
            }
            if pre + ".downsample.0.weight" in sd:
                block["down_conv_w"] = t(sd[pre + ".downsample.0.weight"])
                block["down_bn"] = _bn(sd, pre + ".downsample.1", t)
            stage.append(block)
        stages.append(stage)

    attnpool = {
        "positional_embedding": t(sd["visual.attnpool.positional_embedding"]),
        "q_w": t(sd["visual.attnpool.q_proj.weight"]).T,
        "q_b": t(sd["visual.attnpool.q_proj.bias"]),
        "k_w": t(sd["visual.attnpool.k_proj.weight"]).T,
        "k_b": t(sd["visual.attnpool.k_proj.bias"]),
        "v_w": t(sd["visual.attnpool.v_proj.weight"]).T,
        "v_b": t(sd["visual.attnpool.v_proj.bias"]),
        "c_w": t(sd["visual.attnpool.c_proj.weight"]).T,
        "c_b": t(sd["visual.attnpool.c_proj.bias"]),
    }

    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    embed_dim = width * 32
    heads = embed_dim // 64
    output_dim = np.asarray(attnpool["c_w"]).shape[1]
    spatial = int(
        round((np.asarray(attnpool["positional_embedding"]).shape[0] - 1) ** 0.5)
    )
    meta = {
        "layers": tuple(counts),
        "width": width,
        "heads": heads,
        "output_dim": output_dim,
        "image_resolution": spatial * 32,
    }
    return {"stem": stem, "stages": stages, "attnpool": attnpool}, meta
