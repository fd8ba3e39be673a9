"""'model' mesh axis proven, not just plumbed: a (4,2) mesh tensor-parallels
the CLIP tower MLPs (Megatron-style column/row split via
tower_param_shardings) and produces the SAME numbers as the replicated
program. Also covers the pad-not-replicate eval batch path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.parallel import (
    build_mesh,
    place_tower_params,
    shard_batch,
    tower_param_shardings,
)


@pytest.fixture(scope="module")
def setup():
    cfg = jclip.TINY
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32), jnp.float32)
    return cfg, params, images


def test_tower_param_shardings_spec(setup):
    cfg, params, _ = setup
    mesh = build_mesh(data=4, model=2)
    shardings = tower_param_shardings(mesh, params)
    for tower in ("visual", "text"):
        blocks = shardings[tower]["blocks"]
        assert "model" in str(blocks["c_fc_w"].spec)
        assert "model" in str(blocks["c_fc_b"].spec)
        assert "model" in str(blocks["c_proj_w"].spec)
        assert str(blocks["w_qkv"].spec) == "PartitionSpec()"
    assert str(shardings["logit_scale"].spec) == "PartitionSpec()"


def test_model_parallel_encode_matches_replicated(setup):
    cfg, params, images = setup
    ref = np.asarray(jclip.encode_image(params, cfg, images), np.float32)

    mesh = build_mesh(data=4, model=2)
    params_tp = place_tower_params(mesh, params)
    # params really live sharded over 'model'
    leaf = params_tp["visual"]["blocks"]["c_fc_w"]
    assert "model" in str(leaf.sharding.spec)

    out = jax.jit(lambda p, x: jclip.encode_image(p, cfg, x))(
        params_tp, shard_batch(mesh, images)
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=1e-5)


def test_model_parallel_classifier_generation_matches(setup):
    cfg, params, _ = setup
    n_cls, shots = 8, 4
    feats = jax.random.normal(
        jax.random.PRNGKey(2), (n_cls, shots, cfg.embed_dim), jnp.float32
    )
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    ptok, eot, vtok = ovmr.build_prompt_tokens([f"class {i}" for i in range(n_cls)])
    t_cls = ovmr.text_classifier(params, cfg, jnp.asarray(ptok))

    from ovmr_tpu.models.aggregator import init_aggregator

    agg = init_aggregator(
        jax.random.PRNGKey(3), width=cfg.embed_dim, layers=2, n_ctx=2
    )

    def gen(p, f, pt, e, zs):
        return ovmr.generate_classifiers_from_feats(
            p, cfg, agg, f, pt, e, jnp.asarray(vtok), zs, eval_tau=10.0
        )

    ref = jax.jit(gen)(params, feats, jnp.asarray(ptok), jnp.asarray(eot), t_cls)
    ref = {k: np.asarray(v, np.float32) for k, v in ref.items()}

    mesh = build_mesh(data=4, model=2)
    params_tp = place_tower_params(mesh, params)
    out = jax.jit(gen)(
        params_tp,
        shard_batch(mesh, feats),
        shard_batch(mesh, jnp.asarray(ptok)),
        shard_batch(mesh, jnp.asarray(eot)),
        t_cls,
    )
    for k in ("mm_classifier", "vision_classifier", "fusion_weight"):
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), ref[k], atol=2e-5, err_msg=k
        )


def test_eval_batch_pads_to_device_multiple(setup, capsys):
    """make_feature_extractor with a mesh pads a non-divisible batch size
    and still shards (no silent replication)."""
    from ovmr_tpu.engine.trainer import make_feature_extractor
    from ovmr_tpu.ops.attention import make_attn_fn

    cfg, params, images = setup
    mesh = build_mesh(data=8, model=1)
    encode = make_feature_extractor(
        cfg, make_attn_fn(False), jnp.float32,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        batch_size=12,  # not divisible by 8
        mesh=mesh,
    )
    out = capsys.readouterr().out
    assert "padding compiled batch to 16" in out
    feats = encode(params, np.asarray(images[:5], np.float32))
    assert feats.shape == (5, cfg.embed_dim)
    assert np.isfinite(feats).all()


def test_shard_map_features_match_single_device(setup):
    """The shard_map'd mesh feature extractor (which keeps Pallas kernels
    per-chip on real hardware) equals the single-device path."""
    from ovmr_tpu.engine.trainer import make_feature_extractor
    from ovmr_tpu.ops.attention import make_attn_fn

    cfg, params, images = setup
    kwargs = dict(
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), batch_size=8
    )
    plain = make_feature_extractor(
        cfg, make_attn_fn(False), jnp.float32, **kwargs
    )
    meshy = make_feature_extractor(
        cfg, make_attn_fn(False), jnp.float32,
        mesh=build_mesh(data=8, model=1), **kwargs
    )
    imgs = np.asarray(images, np.float32)
    np.testing.assert_allclose(
        meshy(params, imgs), plain(params, imgs), atol=2e-5
    )
