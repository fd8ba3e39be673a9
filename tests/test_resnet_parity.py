"""ModifiedResNet image tower parity vs a torch golden recorded from the
reference clip/model.py (tiny RN config, fp32)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models.import_torch import clip_params_from_state_dict
from tests.helpers import npz_state_dict

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "clip_rn_tiny_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    params, cfg = clip_params_from_state_dict(npz_state_dict(data, "sd"))
    return data, params, cfg


def test_resnet_config_sniffing(golden):
    _, _, cfg = golden
    assert cfg.is_resnet
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.vision_width == 8
    assert cfg.vision_heads == 4
    assert cfg.image_resolution == 64
    assert cfg.embed_dim == 64


def test_resnet_encode_matches_torch(golden):
    data, params, cfg = golden
    out = jclip.encode_image(params, cfg, jnp.asarray(data["images"]))
    np.testing.assert_allclose(
        np.asarray(out), data["img_feat"], atol=5e-5, rtol=5e-5
    )
