"""OpenAI-clip-shaped compat surface (clip_compat.load/tokenize/model)."""

import numpy as np
import pytest

import jax.numpy as jnp
from PIL import Image

from ovmr_tpu import clip_compat as clip


def test_available_models_is_the_published_zoo():
    assert clip.available_models() == [
        "RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
        "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px",
    ]


@pytest.fixture(scope="module")
def loaded():
    # zero-egress: resolves to smoke-mode random weights by name
    return clip.load("TINY", dtype=jnp.float32)


def test_load_tokenize_encode_contract(loaded):
    model, preprocess = loaded
    img = Image.fromarray(
        (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    )
    x = preprocess(img)
    res = model.cfg.image_resolution
    assert x.shape == (3, res, res) and x.dtype == np.float32

    tokens = clip.tokenize(["a diagram", "a dog", "a cat"])
    assert tokens.shape == (3, 77)

    feats_i = model.encode_image(x[None])
    feats_t = model.encode_text(tokens)
    assert feats_i.shape == (1, model.cfg.embed_dim)
    assert feats_t.shape == (3, model.cfg.embed_dim)

    lpi, lpt = model(x[None], tokens)
    assert lpi.shape == (1, 3) and lpt.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(lpi), np.asarray(lpt).T, atol=1e-6)
    # softmax over classes behaves like the published README example
    probs = np.exp(lpi[0]) / np.exp(lpi[0]).sum()
    assert np.isclose(probs.sum(), 1.0, atol=1e-5)


def test_load_unknown_name_raises():
    with pytest.raises(KeyError):
        clip.load("ViT-Z/99")
