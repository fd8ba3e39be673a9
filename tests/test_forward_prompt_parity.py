"""Full classifier-generation parity vs the REFERENCE CustomCLIP.forward_prompt
itself (mm_classifier_one_prompt.py run end-to-end on CPU via a stub harness;
same images -> image tower -> vokens -> text tower -> classifiers -> fusion)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.import_torch import (
    clip_params_from_state_dict,
    prompt_learner_params_from_state_dict,
)
from ovmr_tpu.ops.layers import l2_normalize
from tests.helpers import npz_state_dict

pytestmark = pytest.mark.quick

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "forward_prompt_golden.npz"
)

CLASSNAMES = ["golden retriever", "tabby cat", "sports car", "red panda"]


def test_full_generation_matches_reference_forward_prompt():
    data = np.load(FIXTURE)
    clip_params, cfg = clip_params_from_state_dict(npz_state_dict(data, "clip"))
    agg_params = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg"), n_layers=4
    )

    n_cls, shots = 4, 4
    images = jnp.asarray(data["images"], jnp.float32)
    feats = l2_normalize(jclip.encode_image(clip_params, cfg, images)).reshape(
        n_cls, shots, -1
    )

    ptok, eot, vtok = ovmr.build_prompt_tokens(CLASSNAMES)
    t_cls = ovmr.text_classifier(clip_params, cfg, jnp.asarray(ptok))
    out = ovmr.generate_classifiers_from_feats(
        clip_params,
        cfg,
        agg_params,
        feats,
        jnp.asarray(ptok),
        jnp.asarray(eot),
        jnp.asarray(vtok),
        t_cls,
        eval_tau=10.0,
    )

    np.testing.assert_allclose(
        np.asarray(out["text_classifier"]), data["text_classifier"],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["mm_classifier"]), data["mm_classifier"],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["vision_classifier"]), data["vision_classifier"],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["fusion_weight"]), data["fusion_weight"], atol=1e-3
    )
