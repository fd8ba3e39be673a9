"""int8 quantized serving path: weight quantization roundtrip, quantized
dense accuracy, and full-tower feature fidelity vs fp32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.layers import l2_normalize
from ovmr_tpu.ops.quant import dense_int8, quantize_params, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # per-channel int8 keeps <1% max error


def test_dense_int8_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    w = rng.randn(64, 32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    q, scale = quantize_weight(w)
    ref = np.asarray(x) @ w + b
    got = np.asarray(dense_int8(x, jnp.asarray(q), jnp.asarray(scale), jnp.asarray(b)))
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_quantized_tower_feature_fidelity():
    cfg = jclip.TINY
    key = jax.random.PRNGKey(0)
    params = jclip.init_params(key, cfg)
    qparams = quantize_params(
        jax.tree_util.tree_map(np.asarray, params)
    )

    images = jax.random.normal(key, (4, 3, 32, 32), jnp.float32)
    ref = l2_normalize(jclip.encode_image(params, cfg, images))
    got = l2_normalize(jclip.encode_image(qparams, cfg, images))
    cos = np.sum(np.asarray(ref) * np.asarray(got), axis=-1)
    assert (cos > 0.995).all(), cos

    tokens = jax.random.randint(key, (4, 77), 1, 400)
    tokens = tokens.at[:, 0].set(510).at[:, 6].set(511)
    ref_t = l2_normalize(jclip.encode_text(params, cfg, tokens))
    got_t = l2_normalize(jclip.encode_text(qparams, cfg, tokens))
    cos_t = np.sum(np.asarray(ref_t) * np.asarray(got_t), axis=-1)
    assert (cos_t > 0.995).all(), cos_t


def test_int8_trainer_eval_only(tmp_path):
    """TPU.INT8: training params stay float; eval uses the quantized copy."""
    import os

    from ovmr_tpu.engine.trainer import build_trainer
    from ovmr_tpu.utils.defaults import get_cfg_default

    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp_path / "out")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp_path / "data")
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
    c.TPU.INT8 = True
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)

    t = build_trainer(c)
    # training params are NOT quantized
    assert t.clip_params["visual"]["blocks"]["w_qkv"].dtype != jnp.int8
    # serving params are
    assert t.serving_params["visual"]["blocks"]["w_qkv"].dtype == jnp.int8
    acc = t.test()
    assert 0.0 <= acc <= 100.0
