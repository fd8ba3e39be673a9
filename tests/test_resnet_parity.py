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


def test_resnet_smoke_init_matches_importer_tree(golden):
    """Name-based smoke init builds the same pytree (paths + shapes) as the
    checkpoint importer, so downstream code can't tell them apart."""
    import jax
    import jax.tree_util as jtu

    _, params, cfg = golden
    smoke = jclip.init_params(jax.random.PRNGKey(0), cfg)
    ref_tree = jtu.tree_map(lambda a: jnp.shape(a), params["visual"])
    smoke_tree = jtu.tree_map(lambda a: jnp.shape(a), smoke["visual"])
    assert ref_tree == smoke_tree


def test_rn_named_configs_registered():
    for name, width, layers, res, dim in [
        ("RN50", 64, (3, 4, 6, 3), 224, 1024),
        ("RN101", 64, (3, 4, 23, 3), 224, 512),
        ("RN50x4", 80, (4, 6, 10, 6), 288, 640),
        ("RN50x16", 96, (6, 8, 18, 8), 384, 768),
        ("RN50x64", 128, (3, 15, 36, 10), 448, 1024),
    ]:
        cfg = jclip.CONFIGS[name]
        assert cfg.is_resnet
        assert cfg.vision_width == width
        assert cfg.vision_layers == layers
        assert cfg.image_resolution == res
        assert cfg.embed_dim == dim
        assert cfg.vision_heads == width * 32 // 64
