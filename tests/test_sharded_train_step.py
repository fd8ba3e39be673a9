"""shard_map multi-chip train step vs the single-program step: same loss,
same updated params (dropout off so the rng streams don't diverge)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ovmr_tpu.engine.optimizers import build_optimizer
from ovmr_tpu.engine.train_step import make_sharded_train_step, make_train_step
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.parallel import build_mesh, shard_batch
from ovmr_tpu.utils.defaults import get_cfg_default


@pytest.fixture(scope="module")
def setup():
    cfg = jclip.TINY
    key = jax.random.PRNGKey(0)
    clip_params = jclip.init_params(key, cfg)
    agg = init_aggregator(key, width=cfg.embed_dim, layers=2, n_ctx=2)
    # sgd: updates are LINEAR in the gradients, so the sharded-vs-single
    # comparison tests the collective math, not adam's sign sensitivity on
    # near-zero gradients
    ocfg = get_cfg_default().OPTIM
    ocfg.NAME = "sgd"
    ocfg.MOMENTUM = 0.0
    ocfg.LR = 0.05
    optimizer = build_optimizer(ocfg)
    opt_state = optimizer.init(agg)

    num_cls, n_ins = 16, 4
    images = jax.random.normal(
        jax.random.PRNGKey(1), (num_cls, n_ins, 3, 32, 32), jnp.float32
    )
    ptok, eot, vtok = ovmr.build_prompt_tokens(
        [f"class {i}" for i in range(num_cls)]
    )
    return (
        cfg, clip_params, agg, optimizer, opt_state, images,
        jnp.asarray(ptok), jnp.asarray(eot), jnp.asarray(vtok),
    )


def test_sharded_step_matches_single_program(setup):
    (cfg, clip_params, agg, optimizer, opt_state, images,
     ptok, eot, vtok) = setup
    rng = jax.random.PRNGKey(7)

    ref_step = make_train_step(cfg, optimizer, dropout=0.0)
    ref_agg, ref_opt, ref_loss = ref_step(
        agg, opt_state, clip_params, images, ptok, eot, vtok, rng, 2
    )

    mesh = build_mesh(data=8, model=1)
    sh_step = make_sharded_train_step(cfg, optimizer, mesh, dropout=0.0)
    sh_agg, sh_opt, sh_loss = sh_step(
        agg, opt_state, clip_params,
        shard_batch(mesh, images), shard_batch(mesh, ptok),
        shard_batch(mesh, eot), vtok, rng, 2,
    )

    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(sh_agg), jax.tree_util.tree_leaves(ref_agg)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_sharded_step_trains(setup):
    """With dropout on, the sharded step still decreases its own loss."""
    (cfg, clip_params, agg, optimizer, opt_state, images,
     ptok, eot, vtok) = setup
    mesh = build_mesh(data=4, model=1)
    step = make_sharded_train_step(cfg, optimizer, mesh, dropout=0.1)
    rng = jax.random.PRNGKey(9)
    losses = []
    a, o = agg, opt_state
    for i in range(4):
        rng, sub = jax.random.split(rng)
        a, o, loss = step(
            a, o, clip_params, shard_batch(mesh, images),
            shard_batch(mesh, ptok), shard_batch(mesh, eot), vtok, sub, 2,
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_step_with_fused_kernels_interpret(setup):
    """The REAL multi-chip path: per-chip fused Pallas towers (forward AND
    the dx backward) inside shard_map — interpret mode stands in for Mosaic
    on the CPU mesh. Must match the XLA-block sharded step."""
    from functools import partial

    from ovmr_tpu.ops.block_fused import fused_residual_block

    (cfg, clip_params, agg, optimizer, opt_state, images,
     ptok, eot, vtok) = setup
    rng = jax.random.PRNGKey(7)
    mesh = build_mesh(data=4, model=1)

    ref_step = make_sharded_train_step(cfg, optimizer, mesh, dropout=0.0)
    fused_step = make_sharded_train_step(
        cfg, optimizer, mesh, dropout=0.0,
        block_fn=partial(fused_residual_block, interpret=True),
    )
    args = (
        agg, opt_state, clip_params, shard_batch(mesh, images),
        shard_batch(mesh, ptok), shard_batch(mesh, eot), vtok, rng, 2,
    )
    ref_agg, _, ref_loss = ref_step(*args)
    f_agg, _, f_loss = fused_step(*args)

    np.testing.assert_allclose(float(f_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(f_agg), jax.tree_util.tree_leaves(ref_agg)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )
