"""TorchScript-archive CLIP ingestion (reference ``clip/clip.py:117-126``
loads OpenAI checkpoints with ``torch.jit.load`` first, falling back to a
plain pickle): script a TINY CLIP-shaped torch module, save the archive,
and assert the archive path and the raw-state_dict path produce identical
param pytrees + config."""

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn

from ovmr_tpu.models.import_torch import (
    clip_params_from_state_dict,
    load_clip,
    load_torch_file,
)

W, HEADS, LAYERS, PATCH, RES, VOCAB, CTX = 64, 2, 2, 8, 32, 128, 77


class _Block(nn.Module):
    def __init__(self, w):
        super().__init__()
        self.attn = nn.MultiheadAttention(w, HEADS)
        self.ln_1 = nn.LayerNorm(w)
        self.mlp = nn.Sequential(
            OrderedDict(
                [("c_fc", nn.Linear(w, w * 4)), ("c_proj", nn.Linear(w * 4, w))]
            )
        )
        self.ln_2 = nn.LayerNorm(w)

    def forward(self, x):
        return x


class _Tower(nn.Module):
    def __init__(self, w):
        super().__init__()
        self.resblocks = nn.Sequential(*[_Block(w) for _ in range(LAYERS)])

    def forward(self, x):
        return x


class _Visual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, W, PATCH, PATCH, bias=False)
        n_tok = (RES // PATCH) ** 2 + 1
        self.class_embedding = nn.Parameter(torch.randn(W))
        self.positional_embedding = nn.Parameter(torch.randn(n_tok, W))
        self.ln_pre = nn.LayerNorm(W)
        self.transformer = _Tower(W)
        self.ln_post = nn.LayerNorm(W)
        self.proj = nn.Parameter(torch.randn(W, W))

    def forward(self, x):
        return x


class _TinyCLIP(nn.Module):
    def __init__(self):
        super().__init__()
        self.visual = _Visual()
        self.transformer = _Tower(W)
        self.token_embedding = nn.Embedding(VOCAB, W)
        self.positional_embedding = nn.Parameter(torch.randn(CTX, W))
        self.ln_final = nn.LayerNorm(W)
        self.text_projection = nn.Parameter(torch.randn(W, W))
        self.logit_scale = nn.Parameter(torch.tensor(2.0))

    def forward(self, x):
        return x


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ts_ingest")
    torch.manual_seed(0)
    model = _TinyCLIP().eval()
    ts_path = str(tmp / "tiny_clip_scripted.pt")
    sd_path = str(tmp / "tiny_clip_state_dict.pt")
    torch.jit.trace(model, torch.zeros(1)).save(ts_path)
    torch.save(model.state_dict(), sd_path)
    return model, ts_path, sd_path


def test_archive_is_torchscript(archives):
    _, ts_path, _ = archives
    torch.jit.load(ts_path, map_location="cpu")  # really a jit archive


def test_load_torch_file_both_formats(archives):
    model, ts_path, sd_path = archives
    sd_ts = load_torch_file(ts_path)
    sd_raw = load_torch_file(sd_path)
    assert set(sd_ts.keys()) == set(model.state_dict().keys())
    assert set(sd_raw.keys()) == set(model.state_dict().keys())


def test_torchscript_params_match_state_dict_path(archives):
    _, ts_path, sd_path = archives
    params_ts, cfg_ts = load_clip(ts_path)
    params_sd, cfg_sd = load_clip(sd_path)
    assert cfg_ts == cfg_sd
    assert cfg_ts.vision_layers == LAYERS
    assert cfg_ts.vision_patch_size == PATCH
    assert cfg_ts.image_resolution == RES
    assert cfg_ts.vocab_size == VOCAB
    import jax

    leaves_ts = jax.tree_util.tree_leaves_with_path(params_ts)
    leaves_sd = dict(
        (path, leaf) for path, leaf in jax.tree_util.tree_leaves_with_path(params_sd)
    )
    assert len(leaves_ts) == len(leaves_sd)
    for path, leaf in leaves_ts:
        np.testing.assert_array_equal(leaf, leaves_sd[path], err_msg=str(path))


def test_converted_params_run_a_forward(archives):
    _, ts_path, _ = archives
    import jax.numpy as jnp

    from ovmr_tpu.models import clip as jclip

    params, cfg = load_clip(ts_path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    img = jnp.zeros((2, 3, RES, RES), jnp.float32)
    feats = jclip.encode_image(params, cfg, img)
    assert feats.shape == (2, W)
    assert np.isfinite(np.asarray(feats)).all()


import jax  # noqa: E402  (used inside tests; kept after torch imports)
