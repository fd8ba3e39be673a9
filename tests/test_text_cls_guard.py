"""The >=5000-class frozen-text-classifier skip.

The reference builds no zero-shot text classifier at >=5000 classes
(``trainers/mm_classifier_one_prompt.py:118-126``) — a build-time
optimization for the ImageNet-21k pretrain; at that scale it cannot
eval/export at all (``forward_prompt`` dereferences the None classifier,
``mm_…:265``). The rebuild honors the guard end-to-end: trainer and API
skip the text head and the fusion that depends on it, the exported
``mm_classifiers.pt`` omits those keys, text/fusion eval modes refuse
loudly, and raising the threshold restores the full artifact.
"""

import os

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def make_trainer(tmp, tag, max_text_classes):
    from ovmr_tpu.engine.trainer import build_trainer

    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / f"out_{tag}")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    c.DATALOADER.TRAIN_X.N_INS = 4
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    c.TPU.TEXT_CLS_MAX_CLASSES = max_text_classes
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return build_trainer(c)


@pytest.fixture(scope="module")
def guarded_and_full(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("text_guard")
    # 8 synthetic classes; threshold 6 triggers the guard (8 >= 6)
    t_guarded = make_trainer(tmp, "guarded", max_text_classes=6)
    t_full = make_trainer(tmp, "full", max_text_classes=5000)
    return t_guarded, t_full


def test_trainer_skips_text_head(guarded_and_full, capsys):
    t_guarded, t_full = guarded_and_full
    out_g = t_guarded.generate_classifiers()
    assert "Skipping frozen text classifier" in capsys.readouterr().out
    assert "text_classifier" not in out_g
    assert "fusion_weight" not in out_g
    # mm/vision heads are unchanged by the guard
    out_f = t_full.generate_classifiers()
    np.testing.assert_allclose(
        out_g["mm_classifier"], out_f["mm_classifier"], atol=1e-6
    )
    np.testing.assert_allclose(
        out_g["vision_classifier"], out_f["vision_classifier"], atol=1e-6
    )
    assert "text_classifier" in out_f and "fusion_weight" in out_f


def test_guarded_artifact_contents(guarded_and_full):
    import torch

    t_guarded, _ = guarded_and_full
    if t_guarded.classifiers is None:
        t_guarded.generate_classifiers()
    data = torch.load(
        os.path.join(t_guarded.output_dir, "mm_classifiers.pt"),
        map_location="cpu", weights_only=False,
    )
    assert set(data.keys()) == {"mm_classifier", "vision_classifier"}
    assert data["mm_classifier"].shape[0] == t_guarded.n_cls
    vt = torch.load(
        os.path.join(t_guarded.output_dir, "visual_tokens.pt"),
        map_location="cpu", weights_only=False,
    )
    assert vt["visual_tokens"].shape[0] == t_guarded.n_cls


def test_text_and_fusion_modes_refuse(guarded_and_full):
    t_guarded, _ = guarded_and_full
    for mode in ("text", "fusion"):
        t_guarded.cfg.EVAL_MODE = mode
        with pytest.raises(ValueError, match="5000-class guard"):
            t_guarded.prepare_test()
    # vision/multimodal still work (an improvement over the reference,
    # which crashes outright at this scale)
    t_guarded.cfg.EVAL_MODE = "multimodal"
    t_guarded.prepare_test()
    batch = {
        "img": np.zeros((2, 3, 32, 32), np.float32),
        "label": np.zeros(2, np.int64),
    }
    probs = t_guarded.model_inference(batch)
    assert probs.shape == (2, t_guarded.n_cls)
    assert np.isfinite(probs).all()


def test_eval_logits_refuse_without_text_head():
    """Every eval surface (infer.py / api.classify use eval_logits_np;
    the device path uses eval_logits) refuses text/fusion against a
    guarded artifact with a clear error, not a raw KeyError."""
    import jax.numpy as jnp

    from ovmr_tpu.models import ovmr

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 8)).astype(np.float32)
    guarded = {
        "mm_classifier": rng.normal(size=(4, 8)).astype(np.float32),
        "vision_classifier": rng.normal(size=(4, 8)).astype(np.float32),
    }
    for mode in ("text", "fusion"):
        with pytest.raises(ValueError, match="5000-class guard"):
            ovmr.eval_logits_np(feats, guarded, 100.0, mode)
        with pytest.raises(ValueError, match="5000-class guard"):
            ovmr.eval_logits(
                jnp.asarray(feats), guarded, jnp.float32(100.0), mode
            )
    for mode in ("vision", "multimodal"):
        probs = ovmr.eval_logits_np(feats, guarded, 100.0, mode)
        assert probs.shape == (2, 4) and np.isfinite(probs).all()
    # a foreign artifact with a text head but no fusion_weight refuses
    # fusion mode the same way (not a raw KeyError)
    partial = dict(guarded, text_classifier=guarded["mm_classifier"])
    with pytest.raises(ValueError, match="fusion_weight"):
        ovmr.eval_logits_np(feats, partial, 100.0, "fusion")
    probs = ovmr.eval_logits_np(feats, partial, 100.0, "text")
    assert probs.shape == (2, 4)


def test_export_refuses_missing_required_keys(tmp_path):
    """Only text_classifier/fusion_weight may legitimately be absent (the
    guard); a missing mm/vision classifier is an upstream bug and must
    fail loudly instead of writing a corrupt artifact."""
    from ovmr_tpu.engine import checkpoint as ckpt

    rng = np.random.default_rng(0)
    base = {
        "mm_classifier": rng.normal(size=(4, 8)).astype(np.float32),
        "vision_classifier": rng.normal(size=(4, 8)).astype(np.float32),
        "visual_tokens": rng.normal(size=(4, 2, 8)).astype(np.float32),
    }
    ckpt.export_classifiers_torch(base, str(tmp_path / "ok"))  # guard shape: fine
    for key in ("mm_classifier", "vision_classifier", "visual_tokens"):
        broken = {k: v for k, v in base.items() if k != key}
        outdir = tmp_path / f"broken_{key}"
        with pytest.raises(KeyError, match=key):
            ckpt.export_classifiers_torch(broken, str(outdir))
        # validation runs BEFORE any write — no half-written artifact
        assert not os.path.exists(outdir / "mm_classifiers.pt")


def test_api_guard_above_5000_classes():
    """>5000 synthetic classes through the API: the DEFAULT threshold (the
    reference's 5000) skips the text head; overriding it restores the full
    artifact with identical mm/vision rows."""
    import jax.numpy as jnp

    from ovmr_tpu.api import OVMRGenerator
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.models.aggregator import init_aggregator

    import jax

    cfg = jclip.TINY
    clip_params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    agg = init_aggregator(jax.random.PRNGKey(1), width=cfg.embed_dim, n_ctx=2)
    gen = OVMRGenerator(clip_params, cfg, agg, dtype=jnp.float32)

    n, k = 5006, 2
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, k, cfg.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    names = [f"thing {i}" for i in range(n)]

    out = gen.generate_from_features(names, feats, chunk_size=2048)
    assert "text_classifier" not in out and "fusion_weight" not in out
    assert out["mm_classifier"].shape == (n, cfg.embed_dim)

    out_full = gen.generate_from_features(
        names, feats, chunk_size=2048, max_text_classes=10**9
    )
    assert out_full["text_classifier"].shape == (n, cfg.embed_dim)
    assert out_full["fusion_weight"].shape == (n, 3)
    np.testing.assert_allclose(
        out["mm_classifier"], out_full["mm_classifier"], atol=1e-6
    )
