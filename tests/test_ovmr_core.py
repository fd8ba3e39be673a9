"""OVMR classifier-generation parity vs torch goldens built from the
reference's own modules (TransformerDropout aggregator + CLIP text tower,
splice/eos semantics of trainers/mm_classifier_one_prompt.py)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.aggregator import generate_vokens
from ovmr_tpu.models.import_torch import (
    clip_params_from_state_dict,
    prompt_learner_params_from_state_dict,
)
from tests.helpers import npz_state_dict

pytestmark = pytest.mark.quick

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ovmr_tiny_golden.npz")


@pytest.fixture(scope="module")
def env():
    data = np.load(FIXTURE)
    clip_params, clip_cfg = clip_params_from_state_dict(npz_state_dict(data, "clip"))
    agg_params = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg"), n_layers=2
    )
    return data, clip_params, clip_cfg, agg_params


def test_vokens_match_reference(env):
    data, _, _, agg_params = env
    vokens = generate_vokens(agg_params, jnp.asarray(data["feats"]))
    np.testing.assert_allclose(
        np.asarray(vokens), data["vokens"], atol=2e-5, rtol=2e-5
    )


def test_prompt_tokens_match_fixture(env):
    data, _, _, _ = env
    ptok, eot_idx, vtok = ovmr.build_prompt_tokens(
        ["golden_retriever", "tabby cat", "sports car"]  # underscore -> space
    )
    np.testing.assert_array_equal(ptok, data["ptok"])
    np.testing.assert_array_equal(eot_idx, data["eot_idx"])
    np.testing.assert_array_equal(vtok, data["vtok"][0])


def test_classifier_heads_match_reference(env):
    data, clip_params, clip_cfg, agg_params = env
    n = data["feats"].shape[0]
    prompt_embeds = jclip.embed_tokens(clip_params, jnp.asarray(data["ptok"]))
    vis_embeds = jnp.broadcast_to(
        jclip.embed_tokens(clip_params, jnp.asarray(data["vtok"])),
        (n, 77, prompt_embeds.shape[-1]),
    )
    mm_cls, v_cls, vokens = ovmr.classifier_heads(
        clip_params,
        clip_cfg,
        agg_params,
        jnp.asarray(data["feats"]),
        prompt_embeds,
        vis_embeds,
        jnp.asarray(data["eot_idx"]),
    )
    np.testing.assert_allclose(np.asarray(mm_cls), data["mm_cls"], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(v_cls), data["v_cls"], atol=3e-5, rtol=3e-5)


def test_text_classifier_matches_reference(env):
    data, clip_params, clip_cfg, _ = env
    t_cls = ovmr.text_classifier(clip_params, clip_cfg, jnp.asarray(data["ptok"]))
    np.testing.assert_allclose(np.asarray(t_cls), data["t_cls"], atol=3e-5, rtol=3e-5)


def test_generate_classifiers_end_to_end(env):
    data, clip_params, clip_cfg, agg_params = env
    t_cls = ovmr.text_classifier(clip_params, clip_cfg, jnp.asarray(data["ptok"]))
    out = ovmr.generate_classifiers_from_feats(
        clip_params,
        clip_cfg,
        agg_params,
        jnp.asarray(data["feats"]),
        jnp.asarray(data["ptok"]),
        jnp.asarray(data["eot_idx"]),
        jnp.asarray(data["vtok"][0]),
        t_cls,
        eval_tau=10.0,
    )
    np.testing.assert_allclose(
        np.asarray(out["mm_classifier"]), data["mm_cls"], atol=3e-5, rtol=3e-5
    )
    fw = np.asarray(out["fusion_weight"])
    assert fw.shape == (3, 3)
    np.testing.assert_allclose(fw.sum(-1), 1.0, atol=1e-6)

    # fusion weights must equal softmax(tau * per-class F1) computed manually
    from sklearn.metrics import f1_score

    feats = data["feats"].reshape(-1, data["feats"].shape[-1]).astype(np.float32)
    labels = np.repeat(np.arange(3), data["feats"].shape[1])
    f1s = []
    for key in ("mm_classifier", "vision_classifier", "text_classifier"):
        preds = (feats @ np.asarray(out[key], np.float32).T).argmax(-1)
        f1s.append(f1_score(labels, preds, average=None, labels=np.arange(3), zero_division=0))
    manual = np.stack(f1s, -1) * 10.0
    manual = np.exp(manual - manual.max(-1, keepdims=True))
    manual = manual / manual.sum(-1, keepdims=True)
    np.testing.assert_allclose(fw, manual, atol=1e-5)


def test_eval_logits_modes(env):
    data, clip_params, clip_cfg, agg_params = env
    t_cls = ovmr.text_classifier(clip_params, clip_cfg, jnp.asarray(data["ptok"]))
    out = ovmr.generate_classifiers_from_feats(
        clip_params, clip_cfg, agg_params,
        jnp.asarray(data["feats"]), jnp.asarray(data["ptok"]),
        jnp.asarray(data["eot_idx"]), jnp.asarray(data["vtok"][0]),
        t_cls, eval_tau=10.0,
    )
    feats = jnp.asarray(data["feats"][:, 0, :])  # one query per class
    scale = np.exp(np.asarray(clip_params["logit_scale"]))
    for mode in ("text", "vision", "multimodal", "fusion"):
        probs = ovmr.eval_logits(feats, out, scale, mode)
        assert probs.shape == (3, 3)
        if mode != "fusion":
            # pure-softmax modes are distributions; fusion is a per-class
            # weighted blend and does NOT row-normalize (reference semantics)
            np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    # fusion equals the manual blend
    import jax

    def p(c):
        return jax.nn.softmax(scale * np.asarray(feats, np.float32) @ np.asarray(c).T, axis=-1)

    manual = (
        np.stack(
            [p(out["mm_classifier"]), p(out["vision_classifier"]), p(out["text_classifier"])],
            axis=-1,
        )
        * np.asarray(out["fusion_weight"])[None]
    ).sum(-1)
    got = ovmr.eval_logits(feats, out, scale, "fusion")
    np.testing.assert_allclose(np.asarray(got), manual, atol=1e-5)


def test_multiclass_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    from ovmr_tpu.ops.fusion import multiclass_f1

    rng = np.random.RandomState(0)
    num_classes = 7
    labels = rng.randint(0, num_classes, size=100)
    logits = rng.randn(100, num_classes).astype(np.float32)
    ours = np.asarray(multiclass_f1(jnp.asarray(logits), jnp.asarray(labels), num_classes))
    preds = logits.argmax(-1)
    ref = f1_score(labels, preds, average=None, labels=np.arange(num_classes), zero_division=0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
