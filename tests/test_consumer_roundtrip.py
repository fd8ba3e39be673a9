"""Plug-and-play consumer round-trip: OUR exported ``mm_classifiers.pt``,
consumed by the REFERENCE's fusion math (``mm_…:349-363``) on a fixed eval
batch, reproduces the reference's fused prediction.

Golden ``consumer_roundtrip_golden.npz`` was recorded by running the
reference ``clip/model.py`` tower (fp32) + the reference-recorded
classifiers from ``forward_prompt_golden.npz`` through the reference eval
lines on a seeded batch."""

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

HERE = os.path.dirname(__file__)
GEN_FIXTURE = os.path.join(HERE, "fixtures", "forward_prompt_golden.npz")
CONSUMER_FIXTURE = os.path.join(HERE, "fixtures", "consumer_roundtrip_golden.npz")
CLASSNAMES = ["golden retriever", "tabby cat", "sports car", "red panda"]


@pytest.fixture(scope="module")
def exported_pt(tmp_path_factory):
    """Run OUR full generation pipeline on the golden weights/exemplars and
    export mm_classifiers.pt through the artifact writer."""
    data = np.load(GEN_FIXTURE)
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
        clip_params, cfg, agg_params, feats,
        jnp.asarray(ptok), jnp.asarray(eot), jnp.asarray(vtok),
        t_cls, eval_tau=10.0,
    )
    out = {k: np.asarray(v, np.float32) for k, v in out.items()}

    from ovmr_tpu.engine.checkpoint import export_classifiers_torch

    outdir = str(tmp_path_factory.mktemp("consumer_rt"))
    export_classifiers_torch(out, outdir)
    return os.path.join(outdir, "mm_classifiers.pt"), clip_params, cfg


def test_exported_artifact_reproduces_reference_fused_prediction(exported_pt):
    """torch-load OUR artifact, run the reference consumer lines on the
    golden eval batch, compare against the reference-recorded prediction."""
    import torch

    pt_path, clip_params, cfg = exported_pt
    golden = np.load(CONSUMER_FIXTURE)

    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    assert set(payload.keys()) == {
        "text_classifier", "vision_classifier", "mm_classifier", "fusion_weight"
    }
    for k, v in payload.items():
        assert v.dtype == torch.float32, k

    # image features from OUR tower on the golden eval batch
    feats_ours = l2_normalize(
        jclip.encode_image(
            clip_params, cfg, jnp.asarray(golden["eval_images"], jnp.float32)
        )
    )
    # accumulation-order noise between XLA and torch fp32 towers sits at
    # ~1e-4 absolute on unit-norm features for this 224-res forward
    np.testing.assert_allclose(
        np.asarray(feats_ours), golden["image_features"], atol=2e-4
    )

    # the reference consumer lines (mm_…:349-363), fed OUR artifact
    feats = torch.tensor(np.asarray(feats_ours, np.float32))
    scale = float(np.exp(golden_logit_scale(clip_params)))
    t_logits = (scale * feats @ payload["text_classifier"].t()).softmax(dim=-1)
    v_logits = (scale * feats @ payload["vision_classifier"].t()).softmax(dim=-1)
    mm_logits = (scale * feats @ payload["mm_classifier"].t()).softmax(dim=-1)
    three = torch.cat(
        [mm_logits.unsqueeze(-1), v_logits.unsqueeze(-1), t_logits.unsqueeze(-1)],
        dim=-1,
    )
    fused = torch.einsum(
        "bmn,mn->bmn", three, payload["fusion_weight"]
    ).sum(-1).numpy()

    np.testing.assert_allclose(fused, golden["fused_probs"], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        mm_logits.numpy(), golden["mm_probs"], atol=2e-4, rtol=2e-3
    )
    assert (fused.argmax(-1) == golden["fused_probs"].argmax(-1)).all()


def test_our_eval_path_matches_reference_consumer(exported_pt):
    """OUR eval_logits_np on OUR artifact equals the reference consumer's
    output too (same classifiers, same math)."""
    import torch

    pt_path, clip_params, cfg = exported_pt
    golden = np.load(CONSUMER_FIXTURE)
    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    classifiers = {
        "mm_classifier": payload["mm_classifier"].numpy(),
        "vision_classifier": payload["vision_classifier"].numpy(),
        "text_classifier": payload["text_classifier"].numpy(),
        "fusion_weight": payload["fusion_weight"].numpy(),
    }
    scale = float(np.exp(golden_logit_scale(clip_params)))
    probs = ovmr.eval_logits_np(
        golden["image_features"], classifiers, scale, "fusion"
    )
    np.testing.assert_allclose(probs, golden["fused_probs"], atol=2e-4, rtol=2e-3)


def golden_logit_scale(clip_params):
    return np.asarray(clip_params["logit_scale"], np.float32)
