"""Training-gradient parity: jax grads of the OVMR loss wrt aggregator
params (flowing through the FROZEN text tower into the vokens) must match
torch autograd on the reference modules."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.import_torch import (
    clip_params_from_state_dict,
    prompt_learner_params_from_state_dict,
)
from tests.helpers import npz_state_dict

pytestmark = pytest.mark.quick

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ovmr_grad_golden.npz")


def test_loss_and_grads_match_torch():
    data = np.load(FIXTURE)
    clip_params, cfg = clip_params_from_state_dict(npz_state_dict(data, "clip"))
    agg_params = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg"), n_layers=2
    )
    agg_params = jax.tree_util.tree_map(jnp.asarray, agg_params)

    q_feats = jnp.asarray(data["q_feats"])
    e_feats = jnp.asarray(data["e_feats"])
    ptok = jnp.asarray(data["ptok"])
    vtok = jnp.asarray(data["vtok"][0])
    eot = jnp.asarray(data["eot"])
    num_cls, split = 3, 2
    labels = jnp.repeat(jnp.arange(num_cls), split)
    scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)

    prompt_embeds = jclip.embed_tokens(clip_params, ptok)
    vis_embeds = jnp.broadcast_to(
        jclip.embed_tokens(clip_params, vtok[None]),
        (num_cls, 77, cfg.transformer_width),
    )

    def loss_fn(agg_p):
        mm_cls, v_cls, _ = ovmr.classifier_heads(
            clip_params, cfg, agg_p, e_feats, prompt_embeds, vis_embeds, eot
        )
        ce = optax.softmax_cross_entropy_with_integer_labels
        qf = q_feats.astype(jnp.float32)
        return (
            ce(scale * qf @ mm_cls.astype(jnp.float32).T, labels).mean()
            + ce(scale * qf @ v_cls.astype(jnp.float32).T, labels).mean()
        )

    loss, grads = jax.value_and_grad(loss_fn)(agg_params)

    np.testing.assert_allclose(float(loss), float(data["loss"]), rtol=1e-5)

    np.testing.assert_allclose(
        np.asarray(grads["cls_token"]), data["grad.cls_token"], atol=2e-5, rtol=1e-3
    )
    blocks = grads["blocks"]
    for i in range(2):
        # our layout is [in, out]; torch grads are [out, in]
        np.testing.assert_allclose(
            np.asarray(blocks["w_qkv"][i]).T,
            data[f"grad.b{i}.in_proj_weight"],
            atol=2e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(blocks["w_out"][i]).T,
            data[f"grad.b{i}.out_proj.weight"],
            atol=2e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(blocks["c_fc_w"][i]).T,
            data[f"grad.b{i}.c_fc.weight"],
            atol=2e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(blocks["c_proj_w"][i]).T,
            data[f"grad.b{i}.c_proj.weight"],
            atol=2e-5, rtol=1e-3,
        )
