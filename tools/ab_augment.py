"""Controlled interleaved A/B: device-aug train step with the old 4-corner
gather crop vs the new MXU matmul crop (batch 1536 = 192cls x 8ins, 256²
uint8 in, full augmentation recipe fused into the step)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from ovmr_tpu.engine.optimizers import build_optimizer
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.ops import augment as aug
from ovmr_tpu.utils.defaults import get_cfg_default


def gather_augment_batch(images_u8, rng, out_size, scale, jitter, gn_std,
                         mean, std, out_dtype, out_layout="NHWC"):
    """The round-1 path: 4-corner gather crop + whole-image flip."""
    b, s, _, _ = images_u8.shape
    k_crop, k_flip, k_jit, k_noise, k_noise_p = jax.random.split(rng, 5)
    x0, y0, cw, ch = aug._sample_crop_boxes(k_crop, b, s, scale)
    x = aug._bilinear_crop(images_u8, x0, y0, cw, ch, out_size) / 255.0
    flip = jax.random.bernoulli(k_flip, 0.5, (b, 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    x = aug._color_jitter(x, k_jit, *jitter)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if gn_std > 0:
        apply = jax.random.bernoulli(k_noise_p, 0.5, (b, 1, 1, 1))
        x = x + jnp.where(apply, jax.random.normal(k_noise, x.shape) * gn_std, 0.0)
    return x.astype(out_dtype)


AUG_KW = dict(
    out_size=224, scale=(0.25, 1.0), jitter=(0.4, 0.4, 0.4, 0.1),
    gn_std=0.15, mean=aug.CLIP_MEAN, std=aug.CLIP_STD, out_dtype=jnp.bfloat16,
)

cfg = jclip.VIT_B16
key = jax.random.PRNGKey(0)
num_cls, n_ins, side = 192, 8, 256
params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)

from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.ops.layers import l2_normalize

agg = init_aggregator(key, width=cfg.embed_dim, layers=4, n_ctx=2)
optimizer = build_optimizer(get_cfg_default().OPTIM)
opt_state = optimizer.init(agg)

ptok, eot, vtok = ovmr.build_prompt_tokens([f"o {i}" for i in range(num_cls)])
ptok_d, eot_d, vtok_d = jnp.asarray(ptok), jnp.asarray(eot), jnp.asarray(vtok)
images_u8 = jax.random.randint(
    key, (num_cls, n_ins, side, side, 3), 0, 255, jnp.uint8
)

import optax

from ovmr_tpu.ops.layers import attention_xla


def make_step(aug_fn):
    @partial(jax.jit, static_argnames=("split_point",))
    def step(agg_params, opt_state, clip_params, images, rng, split_point):
        nc, ni = images.shape[:2]
        rng, aug_rng = jax.random.split(rng)
        flat = aug_fn(images.reshape(nc * ni, side, side, 3), aug_rng, **AUG_KW)
        images_f = flat.reshape(nc, ni, *flat.shape[1:])
        query = images_f[:, :4].reshape(nc * 4, *flat.shape[1:])
        exemplar = images_f[:, 4:].reshape(nc * 4, *flat.shape[1:])
        q_feats = l2_normalize(
            jclip.encode_image(clip_params, cfg, query, layout="NHWC")
        )
        e_feats = l2_normalize(
            jclip.encode_image(clip_params, cfg, exemplar, layout="NHWC")
        ).reshape(nc, 4, -1)
        pe = jclip.embed_tokens(clip_params, ptok_d).astype(e_feats.dtype)
        ve = jnp.broadcast_to(
            jclip.embed_tokens(clip_params, vtok_d[None]).astype(e_feats.dtype),
            (nc, vtok_d.shape[0], e_feats.shape[-1]),
        )
        labels = jnp.repeat(jnp.arange(nc), 4)
        scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)

        def loss_fn(agg_p):
            mm_cls, v_cls, _ = ovmr.classifier_heads(
                clip_params, cfg, agg_p, e_feats, pe, ve, eot_d,
                dropout=0.1, rng=rng,
            )
            qf = q_feats.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels
            return (
                ce(scale * qf @ mm_cls.astype(jnp.float32).T, labels).mean()
                + ce(scale * qf @ v_cls.astype(jnp.float32).T, labels).mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(agg_params)
        updates, new_opt = optimizer.update(grads, opt_state, agg_params)
        return optax.apply_updates(agg_params, updates), new_opt, loss

    return step


def matmul_aug(x, rng, **kw):
    return aug.augment_batch(x, rng, out_layout="NHWC", **kw)


VARIANTS = {"gather_crop": make_step(gather_augment_batch),
            "matmul_crop": make_step(matmul_aug)}

state = {n: (agg, opt_state, jax.random.PRNGKey(7)) for n in VARIANTS}
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    a, o, loss = fn(agg, opt_state, params, images_u8, jax.random.PRNGKey(7), 4)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s loss={float(loss):.3f}")

best = {n: float("inf") for n in VARIANTS}
for rnd in range(3):
    for name, fn in VARIANTS.items():
        a, o, r = state[name]
        t0 = time.perf_counter()
        losses = []
        for _ in range(4):
            r, sub = jax.random.split(r)
            a, o, loss = fn(a, o, params, images_u8, sub, 4)
            losses.append(loss)
        _ = np.asarray(jnp.stack(losses))
        ms = (time.perf_counter() - t0) / 4 * 1e3
        state[name] = (a, o, r)
        best[name] = min(best[name], ms)
        print(f"round {rnd} {name}: {ms:.1f} ms/step")

print("\n=== best ms/step (batch 1536) ===")
for name, ms in best.items():
    print(f"{name}: {ms:.1f} ms  {1536/(ms/1e3):.0f} img/s")
