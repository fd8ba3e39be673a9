"""Tensor parallelism through the TRAINER surface (not just the dryrun).

With TPU.MESH.MODEL > 1 the default route is TP-pallas: split-QKV towers
(head counts that don't divide the axis are zero-padded — exact zeros),
per-leaf 'model' shards, and shard_map seams that run the fused Pallas
kernels per chip. TPU.TP_SPLIT_QKV=False (or INT8 serving) forces the
legacy packed-tower route: plain jit + GSPMD with both Pallas kernels
gated loudly to XLA (no SPMD partitioning rule). These tests pin both
routes on the virtual 8-device CPU mesh: same numbers as the
single-device program. docs/DESIGN.md "Tensor parallelism".
"""

import os

import numpy as np
import pytest

from ovmr_tpu.utils.defaults import get_cfg_default


def make_trainer(tmp, data, model, tag, backbone="TINY", split_qkv=True):
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
    c.MODEL.BACKBONE.NAME = backbone
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "MM_CLS_OP"
    c.TRAINER.COCOOP.N_CTX = 2
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    c.TPU.MESH.DATA = data
    c.TPU.MESH.MODEL = model
    c.TPU.TP_SPLIT_QKV = split_qkv
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return build_trainer(c)


@pytest.fixture(scope="module")
def trainers(tmp_path_factory):
    """Legacy GSPMD TP route, forced via the TPU.TP_SPLIT_QKV=False escape
    hatch (with head-padding, every head count now takes TP-pallas by
    default — the packed-tower plain-jit route needs the explicit
    opt-out)."""
    tmp = tmp_path_factory.mktemp("tp_trainer")
    t_single = make_trainer(tmp, data=1, model=1, tag="single")
    t_tp = make_trainer(tmp, data=4, model=2, tag="tp", split_qkv=False)
    return t_single, t_tp


@pytest.fixture(scope="module")
def tp_pallas_trainers(tmp_path_factory):
    """TINY_TP (both towers' head counts divide model=2): the split-QKV
    TP-pallas route — per-chip fused kernels inside the shard_map seams."""
    tmp = tmp_path_factory.mktemp("tp_pallas_trainer")
    t_single = make_trainer(tmp, data=1, model=1, tag="single",
                            backbone="TINY_TP")
    t_tp = make_trainer(tmp, data=4, model=2, tag="tp", backbone="TINY_TP")
    return t_single, t_tp


def test_tp_pallas_route_engages(tp_pallas_trainers):
    """Dividing head counts take tp == 'pallas': split-QKV towers with
    per-leaf 'model' shards, the shard_map train step STAYS (the round-3
    cliff gated it off), and the plain-jit fallback block is the
    split-layout XLA block."""
    from ovmr_tpu.ops.block_fused_tp import tp_gspmd_block_remat

    _, t_tp = tp_pallas_trainers
    assert t_tp._tp == "pallas"
    assert dict(t_tp.mesh.shape) == {"data": 4, "model": 2}
    assert t_tp.train_step_sharded is not None
    assert t_tp._tp_block_fn is not None and t_tp._clip_specs is not None
    blk = t_tp.clip_params["visual"]["blocks"]
    assert "w_qkv" not in blk and "w_q" in blk
    for leaf in (blk["w_q"], blk["w_out"], blk["c_fc_w"], blk["c_proj_w"]):
        assert "model" in str(leaf.sharding.spec)
    assert t_tp.block_fn is tp_gspmd_block_remat


def test_tp_pallas_generation_matches_single_device(tp_pallas_trainers):
    """Classifier generation through the TP-pallas seams (shard_map over
    both axes, per-chip TP block, split+sharded towers) == single device."""
    t_single, t_tp = tp_pallas_trainers
    out_s = t_single.generate_classifiers()
    out_tp = t_tp.generate_classifiers()
    for key in (
        "mm_classifier", "vision_classifier", "text_classifier",
        "fusion_weight",
    ):
        np.testing.assert_allclose(
            out_tp[key], out_s[key], atol=2e-5,
            err_msg=f"TP-pallas generation diverged on {key}",
        )


def test_tp_pallas_train_step_runs(tp_pallas_trainers):
    """One forward_backward through the TP-pallas shard_map step: finite
    loss, params move, towers stay split+sharded."""
    import jax

    _, t_tp = tp_pallas_trainers
    batch = next(iter(t_tp.train_loader))
    before = np.asarray(
        jax.tree_util.tree_leaves(t_tp.agg_params)[0], np.float32
    ).copy()
    summary = t_tp.forward_backward(batch)
    assert summary is not None and np.isfinite(summary["loss"])
    after = np.asarray(
        jax.tree_util.tree_leaves(t_tp.agg_params)[0], np.float32
    )
    assert not np.array_equal(before, after)


def test_padded_tp_pallas_trainer_matches_single_device(trainers, tmp_path):
    """TINY's 1-head vision tower does NOT divide model=2, yet the default
    route is still TP-pallas — the head axis zero-pads 1->2
    (ops.block_fused_tp.pad_head_shards) and classifier generation through
    the shard_map seams matches the single-device program exactly."""
    t_single, _ = trainers
    t_pad = make_trainer(tmp_path, data=4, model=2, tag="pad")
    assert t_pad._tp == "pallas"
    assert t_pad.train_step_sharded is not None
    blk = t_pad.clip_params["visual"]["blocks"]
    assert "w_q" in blk and "w_qkv" not in blk
    out_s = t_single.generate_classifiers()
    out_p = t_pad.generate_classifiers()
    for key in ("mm_classifier", "vision_classifier", "text_classifier",
                "fusion_weight"):
        np.testing.assert_allclose(
            out_p[key], out_s[key], atol=2e-5,
            err_msg=f"padded TP-pallas generation diverged on {key}",
        )


def test_tp_trainer_routes_gspmd(trainers):
    """TPU.TP_SPLIT_QKV=False forces the legacy packed-tower GSPMD route."""
    _, t_tp = trainers
    assert t_tp.mesh is not None
    assert dict(t_tp.mesh.shape) == {"data": 4, "model": 2}
    assert t_tp._tp == "gspmd"
    # no shard_map step on the legacy route — the plain-jit GSPMD step runs
    assert t_tp.train_step_sharded is None
    # frozen tower params really live TP-sharded over 'model'
    leaf = t_tp.clip_params["visual"]["blocks"]["c_fc_w"]
    assert "model" in str(leaf.sharding.spec)


def test_tp_classifier_generation_matches_single_device(trainers):
    t_single, t_tp = trainers
    out_s = t_single.generate_classifiers()
    out_tp = t_tp.generate_classifiers()
    for key in (
        "mm_classifier", "vision_classifier", "text_classifier",
        "fusion_weight",
    ):
        np.testing.assert_allclose(
            out_tp[key], out_s[key], atol=2e-5,
            err_msg=f"TP generation diverged on {key}",
        )


def test_tp_train_step_runs(trainers):
    """One forward_backward through the GSPMD route: finite loss, params
    move."""
    import jax

    _, t_tp = trainers
    batch = next(iter(t_tp.train_loader))
    before = np.asarray(
        jax.tree_util.tree_leaves(t_tp.agg_params)[0], np.float32
    ).copy()
    summary = t_tp.forward_backward(batch)
    assert summary is not None and np.isfinite(summary["loss"])
    after = np.asarray(
        jax.tree_util.tree_leaves(t_tp.agg_params)[0], np.float32
    )
    assert not np.array_equal(before, after)


def test_pure_tp_builds_mesh(tmp_path):
    """DATA=1, MODEL>1 (pure tensor parallelism — the config for a tower
    too big for one chip) must still build the mesh and TP-place the tower
    params; the DATA!=1 opt-out alone must not disable it."""
    t = make_trainer(tmp_path, data=1, model=2, tag="pure_tp")
    assert t.mesh is not None
    assert dict(t.mesh.shape) == {"data": 1, "model": 2}
    leaf = t.clip_params["visual"]["blocks"]["c_fc_w"]
    assert "model" in str(leaf.sharding.spec)


def test_eval_batch_pads_to_data_axis_not_device_count(capsys):
    """On a data=4 x model=2 mesh, an eval batch of 4 shards cleanly over
    the 'data' axis — it must not be padded to the 8-device count."""
    import jax
    import jax.numpy as jnp

    from ovmr_tpu.engine.trainer import make_feature_extractor
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.attention import make_attn_fn
    from ovmr_tpu.parallel import build_mesh

    cfg = jclip.TINY
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    encode = make_feature_extractor(
        cfg, make_attn_fn(False), jnp.float32,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), batch_size=4,
        mesh=build_mesh(data=4, model=2),
    )
    assert "WARNING" not in capsys.readouterr().out
    feats = encode(params, np.zeros((4, 3, 32, 32), np.float32))
    assert feats.shape[0] == 4 and np.isfinite(feats).all()


def test_setup_trainer_mesh_gates_block_and_attention(capsys):
    """The shared mesh policy gates BOTH Pallas kernels (block and
    attention) off under a model axis — neither has an SPMD partitioning
    rule, and a silent gather around either defeats the requested TP."""
    import jax

    from ovmr_tpu.engine.trainer import setup_trainer_mesh
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.layers import attention_xla

    def fake_pallas_attn(*a, **k):
        raise AssertionError("Pallas attention must be gated off under TP")

    def fake_block_fn(*a, **k):
        raise AssertionError("Pallas block_fn must be gated off under TP")

    c = get_cfg_default()
    c.TPU.MESH.DATA = 4
    c.TPU.MESH.MODEL = 2
    params = jclip.init_params(jax.random.PRNGKey(0), jclip.TINY)
    mesh, tp, placed, block_fn, attn_fn = setup_trainer_mesh(
        c, params, fake_block_fn, fake_pallas_attn
    )
    assert tp and dict(mesh.shape) == {"data": 4, "model": 2}
    assert block_fn is None and attn_fn is attention_xla
    out = capsys.readouterr().out
    assert "block + attention" in out and "no SPMD partitioning rule" in out
    leaf = placed["visual"]["blocks"]["c_fc_w"]
    assert "model" in str(leaf.sharding.spec)

    # data-parallel mesh (model=1): kernels pass through untouched
    c2 = get_cfg_default()
    c2.TPU.MESH.DATA = 4
    mesh2, tp2, _, block2, attn2 = setup_trainer_mesh(
        c2, params, fake_block_fn, fake_pallas_attn
    )
    assert mesh2 is not None and not tp2
    assert block2 is fake_block_fn and attn2 is fake_pallas_attn


def test_feature_extractor_gates_pallas_attention(capsys):
    """A Pallas attn_fn passed alongside a model-parallel mesh is routed
    to the XLA path with a loud log line, and the encode still runs."""
    import jax
    import jax.numpy as jnp

    from ovmr_tpu.engine.trainer import make_feature_extractor
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.parallel import build_mesh

    def fake_pallas_attn(*a, **k):
        raise AssertionError("Pallas attention must be gated off under TP")

    cfg = jclip.TINY
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    encode = make_feature_extractor(
        cfg, fake_pallas_attn, jnp.float32,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), batch_size=8,
        mesh=build_mesh(data=4, model=2),
    )
    assert "routes attention to the XLA" in capsys.readouterr().out
    feats = encode(params, np.zeros((8, 3, 32, 32), np.float32))
    assert np.isfinite(feats).all()


def test_feature_extractor_gates_pallas_loudly(capsys):
    """A block_fn passed alongside a model-parallel mesh is refused with a
    loud log line (Pallas kernels have no SPMD partitioning rule)."""
    import jax.numpy as jnp

    from ovmr_tpu.engine.trainer import make_feature_extractor
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.attention import make_attn_fn
    from ovmr_tpu.parallel import build_mesh

    def fake_block_fn(*a, **k):  # would crash if ever invoked on CPU
        raise AssertionError("Pallas block_fn must be gated off under TP")

    import jax

    cfg = jclip.TINY
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    encode = make_feature_extractor(
        cfg, make_attn_fn(False), jnp.float32,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), batch_size=8,
        mesh=build_mesh(data=4, model=2), block_fn=fake_block_fn,
    )
    assert "XLA block path" in capsys.readouterr().out
    feats = encode(params, np.zeros((8, 3, 32, 32), np.float32))
    assert np.isfinite(feats).all()
