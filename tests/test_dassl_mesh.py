"""Data-parallel mesh for the Dassl trainer families (the TPU-native
replacement for the reference's ``nn.DataParallel`` in
``dassl/engine/trainer.py``): batches shard over the mesh 'data' axis,
model states replicate, and GSPMD partitions every jitted step. The
sharded run must match the single-device program (global BatchNorm
statistics and all-reduced grads come out of the compiler, so the only
differences are fp32 reduction orders)."""

import numpy as np
import pytest
import jax

from ovmr_tpu.engine import register_all_trainers
from ovmr_tpu.engine.trainer import build_trainer

from tests.test_dassl_trainers import make_cfg

register_all_trainers()


@pytest.fixture(autouse=True)
def _tiny_synthetic(monkeypatch):
    monkeypatch.setenv("OVMR_SYNTHETIC", "4,8,32")


def _params_after_train(tmp_path, name, dataset, data_axis, **overrides):
    cfg = make_cfg(
        tmp_path / f"mesh{data_axis}", name, dataset=dataset,
        **{"TPU.MESH.DATA": data_axis, "TEST.NO_TEST": True, **overrides},
    )
    trainer = build_trainer(cfg)
    if data_axis == 1:
        assert trainer.mesh is None
    else:
        assert trainer.mesh is not None, "mesh should form on the 8-dev CPU"
    trainer.train()
    return trainer


def _assert_tree_close(a, b, **kw):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5, **kw
        )


def test_shard_helper_places_batches_on_the_data_axis(tmp_path):
    cfg = make_cfg(tmp_path, "Vanilla", dataset="SyntheticSSL",
                   **{"TEST.NO_TEST": True})
    trainer = build_trainer(cfg)
    assert trainer.mesh is not None
    n = trainer.mesh.shape["data"]
    sharded = trainer._shard(np.zeros((n * 2, 3), np.float32))
    assert not sharded.sharding.is_fully_replicated
    # ragged batches fall back to replication (correct, not distributed)
    ragged = trainer._shard(np.zeros((n * 2 + 1, 3), np.float32))
    assert ragged.sharding.is_fully_replicated
    # registered states replicated
    leaf = jax.tree_util.tree_leaves(trainer.state["params"])[0]
    assert leaf.sharding.is_fully_replicated


def test_vanilla_mesh_matches_single_device(tmp_path):
    t_mesh = _params_after_train(tmp_path, "Vanilla", "SyntheticSSL", -1)
    t_single = _params_after_train(tmp_path, "Vanilla", "SyntheticSSL", 1)
    _assert_tree_close(t_mesh.state["params"], t_single.state["params"])
    _assert_tree_close(
        t_mesh.state["batch_stats"], t_single.state["batch_stats"]
    )


def test_dann_mesh_matches_single_device(tmp_path):
    """Multi-model adversarial step (model + critic, GRL) under GSPMD."""
    t_mesh = _params_after_train(tmp_path, "DANN", "SyntheticDA", -1)
    t_single = _params_after_train(tmp_path, "DANN", "SyntheticDA", 1)
    _assert_tree_close(t_mesh.state["params"], t_single.state["params"])
    _assert_tree_close(
        t_mesh._models["critic"]["params"],
        t_single._models["critic"]["params"],
    )
