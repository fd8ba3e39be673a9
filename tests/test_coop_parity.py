"""CoOp stage-2 prompt-construction parity vs a golden recorded from the
REFERENCE trainers/coop_mm_classifier.py (loaded via a dassl stub harness):
mm/v/t prompt assembly, frozen vokens, shifted EOT gathers."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.import_torch import clip_params_from_state_dict
from ovmr_tpu.ops.layers import l2_normalize
from tests.helpers import npz_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "coop_tiny_golden.npz")


def test_coop_prompt_features_match_reference():
    data = np.load(FIXTURE)
    clip_params, cfg = clip_params_from_state_dict(npz_state_dict(data, "clip"))

    n_cls, n_ctx = 3, 4
    ptok = jnp.asarray(data["ptok"])
    eot_idx = jnp.asarray(data["ptok"].argmax(-1).astype(np.int32))
    emb = jclip.embed_tokens(clip_params, ptok)
    prefix, suffix = emb[:, :1, :], emb[:, 1 + n_ctx :, :]

    from ovmr_tpu.text import tokenize

    vis_tok = jnp.asarray(tokenize(["X X X X ."]))
    vis_emb = jclip.embed_tokens(clip_params, vis_tok)
    vis_tail = jnp.broadcast_to(
        vis_emb[:, 1 + n_ctx : vis_emb.shape[1] - 2, :],
        (n_cls, vis_emb.shape[1] - (1 + n_ctx) - 2, emb.shape[-1]),
    )

    ctx = jnp.broadcast_to(jnp.asarray(data["ctx"])[None], (n_cls, n_ctx, emb.shape[-1]))
    vokens = jnp.asarray(data["vokens"])

    mm = jnp.concatenate([prefix, ctx, vokens, suffix[:, :-2]], axis=1)
    v = jnp.concatenate([prefix, ctx, vokens, vis_tail], axis=1)
    t = jnp.concatenate([prefix, ctx, suffix], axis=1)

    shift = vokens.shape[1]
    mm_f = l2_normalize(jclip.encode_text_embeds(clip_params, cfg, mm, eot_idx + shift))
    v_f = l2_normalize(jclip.encode_text_embeds(clip_params, cfg, v, eot_idx + shift))
    t_f = l2_normalize(jclip.encode_text_embeds(clip_params, cfg, t, eot_idx))

    np.testing.assert_allclose(np.asarray(mm_f), data["mm_f"], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(v_f), data["v_f"], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(t_f), data["t_f"], atol=3e-5, rtol=3e-5)
