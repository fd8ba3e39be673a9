"""Training step: loss decreases, only aggregator params update, schedule and
optimizer semantics match torch, and the step runs sharded on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.schedule import lr_for_epoch
from ovmr_tpu.engine.train_step import make_train_step, sample_split_point
from ovmr_tpu.utils.defaults import get_cfg_default

CFG = jclip.CLIPConfig(
    embed_dim=128,
    image_resolution=32,
    vision_layers=2,
    vision_width=128,
    vision_patch_size=16,
    vocab_size=512,
    transformer_width=128,
    transformer_heads=2,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    clip_params = jclip.init_params(k1, CFG)
    agg_params = init_aggregator(k2, width=128, layers=2, n_ctx=2)

    num_cls, n_ins = 4, 8
    images = jax.random.normal(k3, (num_cls, n_ins, 3, 32, 32), jnp.float32)
    prompt_tokens = jax.random.randint(k4, (num_cls, 77), 1, 400)
    prompt_tokens = prompt_tokens.at[:, 0].set(510)
    prompt_tokens = prompt_tokens.at[:, 6].set(511)  # EOT at index 6
    eot_idx = jnp.full((num_cls,), 6, jnp.int32)
    vis_tokens = jnp.zeros((77,), jnp.int32).at[0].set(510).at[1].set(320).at[2].set(269).at[3].set(511)
    return clip_params, agg_params, images, prompt_tokens, eot_idx, vis_tokens


def test_loss_decreases_and_clip_frozen(setup):
    clip_params, agg_params, images, ptok, eot, vtok = setup
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 1e-3
    optimizer = build_optimizer(cfg.OPTIM)
    opt_state = optimizer.init(agg_params)
    step = make_train_step(CFG, optimizer, dropout=0.0)

    rng = jax.random.PRNGKey(1)
    losses = []
    params = agg_params
    for i in range(8):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, clip_params, images, ptok, eot, vtok, sub, 4
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # aggregator params changed
    assert not np.allclose(
        np.asarray(params["cls_token"]), np.asarray(agg_params["cls_token"])
    )


def test_split_point_sampler():
    rng = np.random.default_rng(0)
    vals = {sample_split_point(rng, 8) for _ in range(200)}
    assert vals == {2, 3, 4, 5}


def test_lr_schedule_matches_torch_sim():
    # golden values from the torch ConstantWarmup+CosineAnnealing simulation
    import math

    lrs = [
        lr_for_epoch(
            e, base_lr=2e-4, max_epoch=30, scheduler="cosine",
            warmup_epoch=1, warmup_type="constant", warmup_cons_lr=1e-5,
        )
        for e in range(4)
    ]
    expected = [
        1e-5,
        2e-4,
        0.5 * 2e-4 * (1 + math.cos(math.pi * 1 / 30)),
        0.5 * 2e-4 * (1 + math.cos(math.pi * 2 / 30)),
    ]
    np.testing.assert_allclose(lrs, expected, rtol=1e-12)


def test_adam_matches_torch():
    import torch

    cfg = get_cfg_default()
    cfg.OPTIM.LR = 1e-2
    cfg.OPTIM.WEIGHT_DECAY = 5e-4
    optimizer = build_optimizer(cfg.OPTIM)

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)

    params = {"w": jnp.asarray(w0)}
    state = optimizer.init(params)
    for _ in range(3):
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
        import optax

        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=1e-2, weight_decay=5e-4)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6, rtol=1e-6
    )


def test_set_lr_changes_updates():
    cfg = get_cfg_default()
    optimizer = build_optimizer(cfg.OPTIM)
    params = {"w": jnp.ones(3)}
    state = optimizer.init(params)
    state = set_lr(state, 0.0)
    updates, state = optimizer.update({"w": jnp.ones(3)}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)


def test_train_step_on_mesh(setup):
    from ovmr_tpu.parallel import build_mesh, replicate, shard_batch

    clip_params, agg_params, images, ptok, eot, vtok = setup
    mesh = build_mesh()
    assert mesh.devices.size == 8

    cfg = get_cfg_default()
    optimizer = build_optimizer(cfg.OPTIM)
    opt_state = optimizer.init(agg_params)
    step = make_train_step(CFG, optimizer, dropout=0.0)

    # shard the class axis over 'data'; replicate everything else
    images8 = jnp.tile(images, (2, 1, 1, 1, 1))  # 8 classes over 8 devices
    ptok8 = jnp.tile(ptok, (2, 1))
    eot8 = jnp.tile(eot, (2,))
    images8 = shard_batch(mesh, images8)
    clip_r = replicate(mesh, clip_params)
    agg_r = replicate(mesh, agg_params)

    new_params, _, loss = step(
        agg_r, opt_state, clip_r, images8, ptok8, eot8, vtok,
        jax.random.PRNGKey(0), 4,
    )
    assert np.isfinite(float(loss))
