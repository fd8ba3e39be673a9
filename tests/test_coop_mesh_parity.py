"""CoOp stage-2 shard_map step vs the single-program step.

The CoOp trainer data-shards its step over the mesh ('data' axis,
pmean'd loss/grads — `engine/coop.py::_build_steps`); with
TPU.MESH.MODEL>1 it takes the plain-jit GSPMD route (TP-placed tower
params, batch over 'data') like MM_CLS_OP. These tests pin that both
sharded steps — and the TP eval path — reproduce the single-device
program on identical batches, and that a TP request on a one-device
host warns loudly instead of silently running un-sharded.
"""

import os

import numpy as np

from ovmr_tpu.utils.defaults import get_cfg_default


def base_cfg(tmp, tag, backbone="TINY"):
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
    c.MODEL.BACKBONE.NAME = backbone
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


def test_coop_tp_step_matches_single_program(tmp_path, capsys):
    """TPU.MESH.MODEL>1 takes the plain-jit GSPMD route (TP-placed tower
    params, batch over 'data') and must reproduce the single program."""
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    c_tp = base_cfg(tmp_path, "tp")
    c_tp.TPU.MESH.DATA = 4
    c_tp.TPU.MESH.MODEL = 2
    c_one = base_cfg(tmp_path, "tp_one")
    c_one.TPU.MESH.DATA = 1

    t_tp = build_trainer(c_tp)
    out = capsys.readouterr().out
    assert "CoOp tensor-parallel mesh" in out
    assert t_tp._tp and dict(t_tp.mesh.shape) == {"data": 4, "model": 2}
    t_one = build_trainer(c_one)
    assert t_one.mesh is None
    np.testing.assert_array_equal(
        np.asarray(t_tp.params["ctx"]), np.asarray(t_one.params["ctx"])
    )

    batch = next(iter(t_one.train_loader))
    s_tp = t_tp.forward_backward(batch)
    s_one = t_one.forward_backward(batch)
    np.testing.assert_allclose(s_tp["loss"], s_one["loss"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t_tp.params["ctx"]),
        np.asarray(t_one.params["ctx"]),
        atol=2e-5,
        err_msg="CoOp GSPMD TP step diverged from the single program",
    )

    # eval path under TP: text features + fusion + inference agree with
    # the single program (before the ragged step below advances t_tp only)
    t_tp.prepare_test()
    t_one.prepare_test()
    for k in ("mm_classifier", "vision_classifier", "text_classifier",
              "fusion_weight"):
        np.testing.assert_allclose(
            t_tp.classifiers[k], t_one.classifiers[k], atol=2e-5,
            err_msg=f"TP eval diverged on {k}",
        )
    logits_tp = t_tp.model_inference(batch)
    logits_one = t_one.model_inference(batch)
    np.testing.assert_allclose(logits_tp, logits_one, atol=2e-4)

    # ragged tail (not divisible by data=4): one program, replicated
    # batch, loud warning — numbers still finite
    capsys.readouterr()
    ragged = {
        "img": np.asarray(batch["img"])[:6],
        "label": np.asarray(batch["label"])[:6],
    }
    summary = t_tp.forward_backward(ragged)
    assert np.isfinite(summary["loss"])
    assert "runs replicated over 'data'" in capsys.readouterr().out


def test_coop_tp_pallas_step_matches_single_program(tmp_path, capsys):
    """TINY_TP + MODEL>1 takes the TP-pallas route: split-QKV towers, the
    shard_map step stays (per-chip TP block, psums over 'model') and must
    reproduce the single program — step, eval classifiers, inference."""
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    c_tp = base_cfg(tmp_path, "tpp", backbone="TINY_TP")
    c_tp.TPU.MESH.DATA = 4
    c_tp.TPU.MESH.MODEL = 2
    c_one = base_cfg(tmp_path, "tpp_one", backbone="TINY_TP")
    c_one.TPU.MESH.DATA = 1

    t_tp = build_trainer(c_tp)
    out = capsys.readouterr().out
    assert "split-QKV" in out
    assert t_tp._tp == "pallas"
    assert dict(t_tp.mesh.shape) == {"data": 4, "model": 2}
    assert "w_q" in t_tp.clip_params["text"]["blocks"]
    t_one = build_trainer(c_one)
    assert t_one.mesh is None
    np.testing.assert_array_equal(
        np.asarray(t_tp.params["ctx"]), np.asarray(t_one.params["ctx"])
    )

    batch = next(iter(t_one.train_loader))
    s_tp = t_tp.forward_backward(batch)
    s_one = t_one.forward_backward(batch)
    np.testing.assert_allclose(s_tp["loss"], s_one["loss"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t_tp.params["ctx"]),
        np.asarray(t_one.params["ctx"]),
        atol=2e-5,
        err_msg="CoOp TP-pallas step diverged from the single program",
    )

    t_tp.prepare_test()
    t_one.prepare_test()
    for k in ("mm_classifier", "vision_classifier", "text_classifier",
              "fusion_weight"):
        np.testing.assert_allclose(
            t_tp.classifiers[k], t_one.classifiers[k], atol=2e-5,
            err_msg=f"TP-pallas eval diverged on {k}",
        )
    logits_tp = t_tp.model_inference(batch)
    logits_one = t_one.model_inference(batch)
    np.testing.assert_allclose(logits_tp, logits_one, atol=2e-4)


def test_coop_data_mesh_ragged_fallback(tmp_path, capsys):
    """Data-parallel route (model=1): a batch divisible by the data axis
    (4) but NOT the device count (8) still takes the shard_map step
    warning-free; a ragged batch falls back to the replicated single
    program with a loud warning."""
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    c = base_cfg(tmp_path, "dp4")
    c.TPU.MESH.DATA = 4
    t = build_trainer(c)
    assert t.mesh is not None and not t._tp
    assert dict(t.mesh.shape) == {"data": 4, "model": 1}

    batch = next(iter(t.train_loader))
    clean = {
        "img": np.asarray(batch["img"])[:12],
        "label": np.asarray(batch["label"])[:12],
    }
    capsys.readouterr()
    summary = t.forward_backward(clean)
    assert np.isfinite(summary["loss"])
    assert "WARNING" not in capsys.readouterr().out

    ragged = {
        "img": np.asarray(batch["img"])[:6],
        "label": np.asarray(batch["label"])[:6],
    }
    summary = t.forward_backward(ragged)
    assert np.isfinite(summary["loss"])
    assert "runs replicated over 'data'" in capsys.readouterr().out


def test_coop_tp_single_device_warns(tmp_path, capsys, monkeypatch):
    import jax

    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    c = base_cfg(tmp_path, "tp_onedev")
    c.TPU.MESH.MODEL = 2
    t = build_trainer(c)
    out = capsys.readouterr().out
    assert "only one device is visible" in out
    assert t.mesh is None and not t._tp
