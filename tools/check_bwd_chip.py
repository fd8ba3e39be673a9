"""On-chip numerics check: Pallas dx backward vs XLA autodiff grads.

Interpret-mode tests (tests/test_block_fused.py) validate the math; this
validates the MOSAIC-COMPILED kernels on the real chip, elementwise, at the
shapes training actually differentiates (CLIP text towers):

  ViT-B/16 text tower: D=512, H=8, L=77 (causal mask)
  ViT-L/14 text tower: D=768, H=12, L=77 (causal mask)

Usage: python tools/check_bwd_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from ovmr_tpu.ops.block_fused import fused_residual_block
from ovmr_tpu.ops.layers import causal_mask, residual_attention_block


def layer_params(key, d, dtype):
    ks = jax.random.split(key, 4)
    s = d ** -0.5
    return {
        "w_qkv": (s * jax.random.normal(ks[0], (d, 3 * d))).astype(dtype),
        "b_qkv": jnp.zeros((3 * d,), dtype),
        "w_out": (s * jax.random.normal(ks[1], (d, d))).astype(dtype),
        "b_out": jnp.zeros((d,), dtype),
        "ln_1_scale": jnp.ones((d,), dtype),
        "ln_1_bias": jnp.zeros((d,), dtype),
        "c_fc_w": (s * jax.random.normal(ks[2], (d, 4 * d))).astype(dtype),
        "c_fc_b": jnp.zeros((4 * d,), dtype),
        "c_proj_w": (s * jax.random.normal(ks[3], (4 * d, d))).astype(dtype),
        "c_proj_b": jnp.zeros((d,), dtype),
        "ln_2_scale": jnp.ones((d,), dtype),
        "ln_2_bias": jnp.zeros((d,), dtype),
    }


def check(name, d, n_head, l, b, dtype):
    key = jax.random.PRNGKey(0)
    p = layer_params(key, d, dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d), dtype)
    mask = causal_mask(l)

    def loss_fused(x_):
        y = fused_residual_block(x_, p, n_head, mask=mask)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(x_):
        y = residual_attention_block(x_, p, n_head, mask)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = np.asarray(jax.jit(jax.grad(loss_fused))(x), np.float32)
    gx = np.asarray(jax.jit(jax.grad(loss_xla))(x), np.float32)
    denom = np.abs(gx).max() or 1.0
    rel = np.abs(gf - gx).max() / denom
    cos = float(
        (gf * gx).sum()
        / (np.linalg.norm(gf) * np.linalg.norm(gx) + 1e-30)
    )
    print(
        f"{name} [{b}x{l}x{d} h{n_head} {dtype.__name__}]: "
        f"max|Δ|/max|g|={rel:.2e} cos={cos:.8f}"
    )
    return rel, cos


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    results = [
        check("ViT-B/16 text", 512, 8, 77, 64, jnp.float32),
        check("ViT-B/16 text", 512, 8, 77, 64, jnp.bfloat16),
        check("ViT-L/14 text", 768, 12, 77, 32, jnp.float32),
        check("ViT-L/14 text", 768, 12, 77, 32, jnp.bfloat16),
    ]
    # fp32: reassociation-only differences; bf16: rounding differences in a
    # single layer stay small and cosine stays ~1
    ok = all(
        (rel < 2e-5 or cos > 0.999) and np.isfinite(rel)
        for rel, cos in results
    )
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
