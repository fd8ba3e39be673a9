"""Tensor-parallel fused-block parity (ops/block_fused_tp.py).

Pins the per-chip TP block — head-split attention + hidden-split MLP with
fp32 partial psums over 'model' — against the single-chip packed-layout
block, on the virtual CPU mesh: interpret=True exercises the actual Pallas
partial kernels, interpret=False the per-chip XLA routing fallback. Also
pins the split-qkv layout round-trip and the PartitionSpec tree
(parallel.clip_pspecs) that the shard_map seams consume.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.block_fused_tp import (
    TP_BLOCK_AXES,
    make_tp_block,
    pad_head_shards,
    split_clip_qkv,
    split_qkv_blocks,
    tp_gspmd_block,
)
from ovmr_tpu.ops.layers import causal_mask, residual_attention_block
from ovmr_tpu.parallel import build_mesh, clip_pspecs

MSIZE = 2


def _layer_packed(key=0):
    params = jclip.init_params(jax.random.PRNGKey(key), jclip.TINY)
    return {k: v[0] for k, v in params["visual"]["blocks"].items()}


def _leaf_specs(split_layer):
    """Per-layer (unstacked) PartitionSpec tree from TP_BLOCK_AXES."""
    out = {}
    for name, leaf in split_layer.items():
        axis = TP_BLOCK_AXES[name]
        if axis is None:
            out[name] = P()
        else:
            spec = [None] * leaf.ndim
            spec[axis] = "model"
            out[name] = P(*spec)
    return out


@pytest.fixture(scope="module")
def setup():
    p = _layer_packed()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 64), jnp.float32)
    return x, p, 2  # n_head=2 divides MSIZE=2 (1 local head per chip)


def _run_tp(x, p_packed, n_head, mask=None, interpret=False, pad=False):
    mesh = build_mesh(data=1, model=MSIZE)
    sp = split_qkv_blocks(p_packed)
    if pad:
        sp = pad_head_shards(sp, x.shape[-1] // n_head, MSIZE)
    block = make_tp_block(MSIZE, interpret=interpret)
    fn = shard_map(
        lambda x_, p_: block(x_, p_, n_head, mask),
        mesh=mesh,
        in_specs=(P(), _leaf_specs(sp)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(x, sp)


def test_split_layout_gspmd_block_matches_packed(setup):
    """tp_gspmd_block (split-qkv, global view) == packed block exactly —
    same contractions, q/k/v as three matmuls instead of one."""
    x, p, n_head = setup
    ref = residual_attention_block(x, p, n_head)
    got = tp_gspmd_block(x, split_qkv_blocks(p), n_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("interpret", [False, True], ids=["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True], ids=["nomask", "causal"])
def test_tp_block_matches_single_chip(setup, interpret, masked):
    """Per-chip partials + psum over 'model' == the single-chip block.
    interpret=True runs the real Pallas partial kernels (Mosaic interpret
    mode); interpret=False the per-chip XLA fallback routing."""
    x, p, n_head = setup
    mask = causal_mask(x.shape[1]) if masked else None
    ref = residual_attention_block(x, p, n_head, mask)
    got = _run_tp(x, p, n_head, mask=mask, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("interpret", [False, True], ids=["xla", "pallas"])
def test_tp_block_grad_matches_single_chip(setup, interpret):
    """dx through the TP custom VJP (per-chip recompute, dx-partial psum)
    == dx through the plain block — the gradient the CoOp text tower
    threads into prompt embeddings."""
    x, p, n_head = setup
    mask = causal_mask(x.shape[1])
    cot = jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)

    ref = jax.grad(
        lambda x_: jnp.vdot(residual_attention_block(x_, p, n_head, mask), cot)
    )(x)

    mesh = build_mesh(data=1, model=MSIZE)
    sp = split_qkv_blocks(p)
    block = make_tp_block(MSIZE, interpret=interpret)

    def local_loss(x_, p_):
        return jnp.vdot(block(x_, p_, n_head, mask), cot)

    got = jax.jit(
        shard_map(
            jax.grad(local_loss),
            mesh=mesh,
            in_specs=(P(), _leaf_specs(sp)),
            out_specs=P(),
            check_vma=False,
        )
    )(x, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_block_rejects_nondividing_heads(setup):
    """A head count that doesn't divide the model width is rejected; a
    non-dividing MODEL-axis head count is the padded route's job, not an
    error (see the padded tests below)."""
    x, p, _ = setup
    with pytest.raises(ValueError, match="not divisible"):
        make_tp_block(MSIZE)(x, split_qkv_blocks(p), 3)


@pytest.mark.parametrize("interpret", [False, True], ids=["xla", "pallas"])
@pytest.mark.parametrize("masked", [False, True], ids=["nomask", "causal"])
def test_padded_tp_block_matches_single_chip(setup, interpret, masked):
    """n_head=1 (TINY's vision tower) does not divide model=2: the head
    axis zero-pads 1->2 and the per-chip TP block still matches the packed
    single-chip block exactly — the padded head contributes exact zeros."""
    x, p, _ = setup
    n_head = 1  # head dim 64 — indivisible by MSIZE without padding
    mask = causal_mask(x.shape[1]) if masked else None
    ref = residual_attention_block(x, p, n_head, mask)
    got = _run_tp(x, p, n_head, mask=mask, interpret=interpret, pad=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("interpret", [False, True], ids=["xla", "pallas"])
def test_padded_tp_block_grad_matches_single_chip(setup, interpret):
    """dx through the padded TP custom VJP == dx through the plain block:
    the padded head's zero q/k/v matrices contribute exact-zero
    cotangents."""
    x, p, _ = setup
    n_head = 1
    mask = causal_mask(x.shape[1])
    cot = jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)

    ref = jax.grad(
        lambda x_: jnp.vdot(residual_attention_block(x_, p, n_head, mask), cot)
    )(x)

    mesh = build_mesh(data=1, model=MSIZE)
    sp = pad_head_shards(split_qkv_blocks(p), x.shape[-1] // n_head, MSIZE)
    block = make_tp_block(MSIZE, interpret=interpret)

    got = jax.jit(
        shard_map(
            jax.grad(lambda x_, p_: jnp.vdot(block(x_, p_, n_head, mask), cot)),
            mesh=mesh,
            in_specs=(P(), _leaf_specs(sp)),
            out_specs=P(),
            check_vma=False,
        )
    )(x, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_padded_gspmd_block_matches_packed(setup):
    """The split-layout global-view XLA block re-derives the padded head
    count from the leaf shapes: padded layout == packed block exactly."""
    x, p, _ = setup
    n_head = 1
    ref = residual_attention_block(x, p, n_head)
    padded = pad_head_shards(split_qkv_blocks(p), x.shape[-1] // n_head, MSIZE)
    got = tp_gspmd_block(x, padded, n_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_split_clip_qkv_pads_only_nondividing_towers():
    """TINY at msize=2: the 1-head vision tower pads 1->2 (w_q widens by
    one head dim, w_out gains zero rows); the 2-head text tower is
    untouched. Without cfg/msize, nothing pads (backward compat)."""
    params = jclip.init_params(jax.random.PRNGKey(0), jclip.TINY)
    sp = split_clip_qkv(params, msize=MSIZE, cfg=jclip.TINY)
    vd = params["visual"]["blocks"]["w_qkv"].shape[-2]
    assert sp["visual"]["blocks"]["w_q"].shape[-1] == 2 * vd
    assert sp["visual"]["blocks"]["w_out"].shape[-2] == 2 * vd
    pad_cols = np.asarray(sp["visual"]["blocks"]["w_q"][..., vd:])
    assert (pad_cols == 0).all()
    td = params["text"]["blocks"]["w_qkv"].shape[-2]
    assert sp["text"]["blocks"]["w_q"].shape[-1] == td

    unpadded = split_clip_qkv(params)
    assert unpadded["visual"]["blocks"]["w_q"].shape[-1] == vd


def test_split_clip_qkv_and_pspecs():
    """Full-tree split: both ViT towers convert; clip_pspecs shards exactly
    the TP_BLOCK_AXES dims (offset by the stacked layer dim) and leaves
    everything else — embeddings, ln_final, logit_scale — replicated."""
    params = jclip.init_params(jax.random.PRNGKey(0), jclip.TINY_TP)
    sp = split_clip_qkv(params)
    for tower in ("visual", "text"):
        blk = sp[tower]["blocks"]
        assert "w_qkv" not in blk and "b_qkv" not in blk
        d = params[tower]["blocks"]["w_qkv"].shape[-2]
        assert blk["w_q"].shape[-1] == d == blk["w_v"].shape[-1]

    specs = clip_pspecs(sp, MSIZE)
    vb = specs["visual"]["blocks"]
    assert vb["w_q"] == P(None, None, "model")
    assert vb["w_out"] == P(None, "model", None)
    assert vb["c_fc_w"] == P(None, None, "model")
    assert vb["c_fc_b"] == P(None, "model")
    assert vb["c_proj_w"] == P(None, "model", None)
    assert vb["b_out"] == P() and vb["ln_1_scale"] == P()
    # non-block leaves replicate
    assert specs["logit_scale"] == P()
    assert specs["visual"]["patch_embed_w"] == P()

    # packed trees keep the legacy Megatron MLP-only split
    packed = clip_pspecs(params, MSIZE)
    pb = packed["visual"]["blocks"]
    assert pb["w_qkv"] == P() and pb["c_fc_w"] == P(None, None, "model")


def test_tp_encode_image_matches_single_chip():
    """Whole ViT tower under shard_map with the TP block (split, sharded
    params) == plain encode_image on the packed tree — the eval-encode
    seam make_feature_extractor builds at tp == 'pallas'."""
    cfg = jclip.TINY_TP
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(
        jax.random.PRNGKey(2), (8, 3, 32, 32), jnp.float32
    )
    ref = jclip.encode_image(params, cfg, images)

    mesh = build_mesh(data=4, model=MSIZE)
    sp = split_clip_qkv(params)
    block = make_tp_block(MSIZE)

    fn = shard_map(
        lambda p_, im: jclip.encode_image(p_, cfg, im, block_fn=block),
        mesh=mesh,
        in_specs=(clip_pspecs(sp, MSIZE), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    got = jax.jit(fn)(sp, images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
