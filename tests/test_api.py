"""High-level API: generate classifiers from raw exemplar images, classify,
export and reload the torch artifact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.api import OVMRGenerator, load_exported_classifiers
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.aggregator import init_aggregator


@pytest.fixture(scope="module")
def gen():
    cfg = jclip.TINY
    key = jax.random.PRNGKey(0)
    clip_params = jclip.init_params(key, cfg)
    agg_params = init_aggregator(key, width=cfg.embed_dim, layers=2, n_ctx=2)
    return OVMRGenerator(clip_params, cfg, agg_params, dtype=jnp.float32)


def test_generate_and_classify(gen, tmp_path):
    rng = np.random.RandomState(0)
    classnames = ["red circle", "green square", "blue triangle"]
    exemplars = rng.rand(3, 4, 3, 32, 32).astype(np.float32)
    out = gen.generate(classnames, exemplars)
    assert out["mm_classifier"].shape == (3, gen.clip_cfg.embed_dim)
    assert out["fusion_weight"].shape == (3, 3)

    queries = rng.rand(5, 3, 32, 32).astype(np.float32)
    for mode in ("text", "vision", "multimodal", "fusion"):
        probs = gen.classify(queries, out, mode=mode)
        assert probs.shape == (5, 3)

    gen.export(out, str(tmp_path))
    loaded = load_exported_classifiers(str(tmp_path / "mm_classifiers.pt"))
    np.testing.assert_allclose(
        loaded["mm_classifier"], out["mm_classifier"], atol=1e-6
    )


def test_chunked_generate_matches_single_program(gen):
    """Above chunk_size the API runs the trainer's chunked recipe; the
    classifiers and fusion weights must match the one-shot program (the
    F1 cross-validation sees identical logits either way)."""
    rng = np.random.RandomState(1)
    classnames = [f"thing {i}" for i in range(7)]
    feats = rng.rand(7, 4, gen.clip_cfg.embed_dim).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    single = gen.generate_from_features(classnames, feats)
    chunked = gen.generate_from_features(classnames, feats, chunk_size=3)
    for key in ("mm_classifier", "vision_classifier", "text_classifier",
                "fusion_weight", "visual_tokens"):
        np.testing.assert_allclose(
            chunked[key], single[key], atol=2e-5, rtol=2e-5, err_msg=key
        )


def test_chunked_generate_matches_single_program_bf16():
    """Same boundary-independence in the bf16 compute dtype the TPU
    trainers ship: fusion must see dtype-rounded exemplars on both
    paths."""
    cfg = jclip.TINY
    key = jax.random.PRNGKey(7)
    g = OVMRGenerator(
        jclip.init_params(key, cfg),
        cfg,
        init_aggregator(key, width=cfg.embed_dim, layers=2, n_ctx=2),
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(2)
    classnames = [f"item {i}" for i in range(6)]
    feats = rng.rand(6, 4, cfg.embed_dim).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    single = g.generate_from_features(classnames, feats)
    chunked = g.generate_from_features(classnames, feats, chunk_size=4)
    np.testing.assert_array_equal(
        chunked["fusion_weight"], single["fusion_weight"]
    )
    for key2 in ("mm_classifier", "vision_classifier", "text_classifier"):
        np.testing.assert_allclose(
            chunked[key2], single[key2], atol=2e-2, rtol=2e-2, err_msg=key2
        )


def test_encode_images_batched_matches_single():
    cfg = jclip.TINY
    key = jax.random.PRNGKey(3)
    g = OVMRGenerator(
        jclip.init_params(key, cfg),
        cfg,
        init_aggregator(key, width=cfg.embed_dim, layers=2, n_ctx=2),
        dtype=jnp.float32,
    )
    imgs = np.random.RandomState(4).rand(7, 3, 32, 32).astype(np.float32)
    whole = g.encode_images(imgs)
    sliced = g.encode_images(imgs, batch_size=3)
    np.testing.assert_allclose(sliced, whole, atol=1e-5, rtol=1e-5)
