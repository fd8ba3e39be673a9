"""Numerical parity of the JAX CLIP towers vs torch goldens recorded from the
reference architecture (fixture committed; generated once from
/root/reference/clip/model.py with a tiny random-init CLIP in fp32)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.import_torch import clip_params_from_state_dict

pytestmark = pytest.mark.quick

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "clip_tiny_golden.npz")


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}

    class _FakeTensor:
        """numpy-backed stand-in so clip_params_from_state_dict can consume
        recorded state_dicts without torch."""

        def __init__(self, a):
            self.a = np.asarray(a)

        @property
        def shape(self):
            return self.a.shape

        def detach(self):
            return self

        def cpu(self):
            return self

        def float(self):
            return _FakeTensor(self.a.astype(np.float32))

        def numpy(self):
            return self.a

    wrapped = {k: _FakeTensor(v) for k, v in sd.items()}
    params, cfg = clip_params_from_state_dict(wrapped)
    return data, params, cfg


def test_config_sniffing(golden):
    _, _, cfg = golden
    assert cfg.vision_layers == 2
    assert cfg.vision_width == 128
    assert cfg.vision_heads == 2
    assert cfg.vision_patch_size == 16
    assert cfg.transformer_layers == 2
    assert cfg.transformer_heads == 2
    assert cfg.embed_dim == 64
    assert cfg.vocab_size == 512


def test_encode_image_matches_torch(golden):
    data, params, cfg = golden
    out = jclip.encode_image(params, cfg, jnp.asarray(data["images"]))
    np.testing.assert_allclose(np.asarray(out), data["img_feat"], atol=2e-5, rtol=2e-5)


def test_encode_text_matches_torch(golden):
    data, params, cfg = golden
    out = jclip.encode_text(params, cfg, jnp.asarray(data["tokens"]))
    np.testing.assert_allclose(np.asarray(out), data["txt_feat"], atol=2e-5, rtol=2e-5)


def test_encode_text_embeds_matches_torch(golden):
    # prompt-side variant: pre-built embeddings, positional embedding sliced
    # to length 40, explicit eos gather (reference mm_…:63-91 semantics)
    data, params, cfg = golden
    tokens40 = jnp.asarray(data["tokens"][:, :40])
    embeds = jclip.embed_tokens(params, tokens40)
    out = jclip.encode_text_embeds(
        params, cfg, embeds, jnp.asarray(data["eos40"])
    )
    np.testing.assert_allclose(
        np.asarray(out), data["txt_embeds_feat"], atol=2e-5, rtol=2e-5
    )


def test_clip_forward_contrastive(golden):
    data, params, cfg = golden
    li, lt = jclip.clip_forward(
        params, cfg, jnp.asarray(data["images"]), jnp.asarray(data["tokens"])
    )
    assert li.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T)


def test_bf16_path_close_to_fp32(golden):
    data, params, cfg = golden
    p16 = jclip.cast_params(params, jnp.bfloat16)
    out16 = jclip.encode_image(p16, cfg, jnp.asarray(data["images"]))
    assert out16.dtype == jnp.bfloat16
    ref = data["img_feat"]
    rel = np.abs(np.asarray(out16, np.float32) - ref) / (np.abs(ref) + 1e-3)
    assert rel.mean() < 0.05


def test_fp16_path_close_to_fp32(golden):
    # TPU.DTYPE=float16 mirrors the reference numerics (fp16 params,
    # fp32 LayerNorm); verify the path runs and stays close to fp32
    data, params, cfg = golden
    import jax.numpy as jnp
    import numpy as np

    p16 = jclip.cast_params(params, jnp.float16)
    out16 = jclip.encode_image(p16, cfg, jnp.asarray(data["images"], jnp.float16))
    assert out16.dtype == jnp.float16
    ref = data["img_feat"]
    rel = np.abs(np.asarray(out16, np.float32) - ref) / (np.abs(ref) + 1e-3)
    assert rel.mean() < 0.02
