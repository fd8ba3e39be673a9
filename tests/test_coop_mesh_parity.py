"""CoOp stage-2 shard_map step vs the single-program step.

The CoOp trainer data-shards its step over the mesh ('data' axis,
pmean'd loss/grads — `engine/coop.py::_build_steps`). These tests pin
that the sharded step produces the same numbers as the single-device
program on an identical batch, and that the loud no-TP note fires when
someone asks CoOp for a model axis (CoOp has no TP step — towers are
frozen and fit one chip; TP lives in MM_CLS_OP).
"""

import os

import numpy as np

from ovmr_tpu.utils.defaults import get_cfg_default


def base_cfg(tmp, tag):
    c = get_cfg_default()
    c.OUTPUT_DIR = str(tmp / f"out_{tag}")
    c.SEED = 1
    c.DATASET.ROOT = str(tmp / "data")
    c.DATASET.NAME = "Synthetic"
    c.DATASET.NUM_SHOTS = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ["normalize"]
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 16  # divisible by the 8-device mesh
    c.DATALOADER.TEST.BATCH_SIZE = 16
    c.DATALOADER.NUM_WORKERS = 2
    c.MODEL.BACKBONE.NAME = "TINY"
    c.OPTIM.MAX_EPOCH = 1
    c.TRAINER.NAME = "CoOp"
    c.TRAINER.COOP.N_CTX = 2
    c.TRAINER.COOP.CTX_INIT = ""
    c.TRAINER.COOP.CSC = False
    c.TEST.NO_TEST = True
    c.TPU.DTYPE = "float32"
    os.makedirs(c.OUTPUT_DIR, exist_ok=True)
    return c


def test_coop_sharded_step_matches_single_program(tmp_path):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    c_mesh = base_cfg(tmp_path, "mesh")  # MESH.DATA=-1 -> data=8 mesh
    c_one = base_cfg(tmp_path, "one")
    c_one.TPU.MESH.DATA = 1  # single-program reference

    t_mesh = build_trainer(c_mesh)
    t_one = build_trainer(c_one)
    assert t_mesh.mesh is not None and t_mesh.mesh.devices.size == 8
    assert t_one.mesh is None
    # same seed -> identical init
    np.testing.assert_array_equal(
        np.asarray(t_mesh.params["ctx"]), np.asarray(t_one.params["ctx"])
    )

    # one identical batch through both steps (n_cls=8 <= 400, so
    # prompt_ind is deterministically 0 — no RNG divergence)
    batch = next(iter(t_one.train_loader))
    s_mesh = t_mesh.forward_backward(batch)
    s_one = t_one.forward_backward(batch)
    assert np.isfinite(s_mesh["loss"]) and np.isfinite(s_one["loss"])
    np.testing.assert_allclose(s_mesh["loss"], s_one["loss"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t_mesh.params["ctx"]),
        np.asarray(t_one.params["ctx"]),
        atol=2e-5,
        err_msg="sharded CoOp step diverged from the single program",
    )


def test_coop_model_axis_note_is_loud(tmp_path, capsys):
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    c = base_cfg(tmp_path, "tp_note")
    c.TPU.MESH.DATA = 4
    c.TPU.MESH.MODEL = 2
    t = build_trainer(c)
    out = capsys.readouterr().out
    assert "CoOp ignores TPU.MESH.MODEL" in out
    # data-parallel mesh still built; step still runs
    assert t.mesh is not None
    batch = next(iter(t.train_loader))
    summary = t.forward_backward(batch)
    assert np.isfinite(summary["loss"])

    # a batch divisible by the data axis (4) but NOT the device count (8)
    # must still shard; a ragged one falls back loudly
    capsys.readouterr()
    ragged = {
        "img": np.asarray(batch["img"])[:6],
        "label": np.asarray(batch["label"])[:6],
    }
    summary = t.forward_backward(ragged)
    assert np.isfinite(summary["loss"])
    assert "runs replicated" in capsys.readouterr().out
    clean = {
        "img": np.asarray(batch["img"])[:12],
        "label": np.asarray(batch["label"])[:12],
    }
    summary = t.forward_backward(clean)
    assert np.isfinite(summary["loss"])
    assert "WARNING" not in capsys.readouterr().out
