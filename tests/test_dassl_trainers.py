"""DA/DG/SSL trainer families (reference ``dassl/engine/{da,dg,ssl}/``)
driven end-to-end: every registered trainer builds its models, runs a
full (tiny) training epoch through the real epoch loop, evaluates, and
produces finite losses. Uses the Synthetic{SSL,DA} datasets at 32x32
with the ``cnn_digitsdg`` backbone."""

import os

import numpy as np
import pytest

from ovmr_tpu.engine import register_all_trainers
from ovmr_tpu.engine.trainer import TRAINER_REGISTRY, build_trainer
from ovmr_tpu.utils.defaults import get_cfg_default

register_all_trainers()


@pytest.fixture(autouse=True)
def _tiny_synthetic(monkeypatch):
    # 4 classes x 8 images at 32px — train 16, val 8, test 8
    monkeypatch.setenv("OVMR_SYNTHETIC", "4,8,32")


def make_cfg(tmp_path, trainer, dataset="SyntheticSSL", **overrides):
    cfg = get_cfg_default()
    cfg.TRAINER.NAME = trainer
    cfg.DATASET.NAME = dataset
    cfg.DATASET.ROOT = "/tmp/ovmr_data"
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.BACKBONE.PRETRAINED = False
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TRAIN_U.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.01
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAIN.PRINT_FREQ = 1
    cfg.TEST.NO_TEST = False
    for key, value in overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    cfg.freeze()
    return cfg


def run_trainer(cfg):
    trainer = build_trainer(cfg)
    trainer.train()
    return trainer


# ---- SSL family ----------------------------------------------------------

SSL_SIMPLE = ["SupBaseline", "EntMin"]


@pytest.mark.parametrize("name", SSL_SIMPLE)
def test_ssl_simple(tmp_path, name):
    cfg = make_cfg(tmp_path, name)
    trainer = run_trainer(cfg)
    # a checkpoint with the pointer contract was written
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model", "checkpoint"))


def test_mean_teacher(tmp_path):
    cfg = make_cfg(tmp_path, "MeanTeacher")
    import jax

    trainer = build_trainer(cfg)
    # snapshot the teacher's initial parameters (a copy of the student's)
    init = jax.tree_util.tree_map(
        lambda a: np.array(a), trainer.teacher["params"]
    )
    trainer.train()
    # the EMA teacher actually moved away from that initial copy (at
    # global step 0 ema_alpha == 0, so the teacher tracks the updated
    # student exactly — any live training must displace it)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.teacher["params"], init,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_mixmatch(tmp_path):
    cfg = make_cfg(
        tmp_path, "MixMatch", **{"DATALOADER.K_TRANSFORMS": 2}
    )
    run_trainer(cfg)


def test_fixmatch_and_pseudo_label_stats(tmp_path):
    cfg = make_cfg(
        tmp_path, "FixMatch",
        **{"TRAINER.FIXMATCH.STRONG_TRANSFORMS":
           ("random_flip", "cutout")},
    )
    trainer = build_trainer(cfg)
    loader_x = iter(trainer.dm.train_loader_x)
    loader_u = iter(trainer.dm.train_loader_u)
    batch_x, batch_u = next(loader_x), next(loader_u)
    assert "img2" in batch_x and "img2" in batch_u
    trainer.num_batches = 1
    trainer.batch_idx = 0
    out = trainer.forward_backward_xu(batch_x, batch_u)
    for key in ("loss_x", "loss_u", "y_u_pred_keep"):
        assert np.isfinite(out[key])


def test_fixmatch_requires_strong_transforms(tmp_path):
    with pytest.raises(AssertionError):
        make_cfg_and_build = build_trainer(make_cfg(tmp_path, "FixMatch"))


# ---- DA family -----------------------------------------------------------

def test_source_only_and_eval(tmp_path):
    cfg = make_cfg(tmp_path, "SourceOnly", dataset="SyntheticDA")
    trainer = run_trainer(cfg)
    batch = next(iter(trainer.dm.test_loader))
    out = trainer.model_inference(batch)
    assert out.shape == (len(batch["label"]), trainer.num_classes)


def test_dann(tmp_path):
    cfg = make_cfg(tmp_path, "DANN", dataset="SyntheticDA")
    trainer = run_trainer(cfg)
    assert "critic" in trainer._models


def _save_source_weights(cfg, tmp_path):
    """Write an npz the INIT_WEIGHTS contract can load."""
    import jax

    from ovmr_tpu.engine import checkpoint as ckpt
    from ovmr_tpu.engine.dassl_base import build_simplenet

    net = build_simplenet(cfg, cfg.MODEL, 4)
    import jax.numpy as jnp

    vs = net.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((2, 32, 32, 3)), train=False)
    tree = {"params": vs["params"],
            "batch_stats": vs.get("batch_stats", {})}
    path = ckpt.save_checkpoint(str(tmp_path / "src"), "model", 1, tree)
    return path


def test_adda(tmp_path):
    base = make_cfg(tmp_path, "SourceOnly", dataset="SyntheticDA")
    weights = _save_source_weights(base, tmp_path)
    cfg = make_cfg(tmp_path, "ADDA", dataset="SyntheticDA",
                   **{"MODEL.INIT_WEIGHTS": weights})
    run_trainer(cfg)


def test_adabn_updates_only_bn_stats(tmp_path):
    base = make_cfg(tmp_path, "SourceOnly", dataset="SyntheticDA")
    weights = _save_source_weights(base, tmp_path)
    cfg = make_cfg(tmp_path, "AdaBN", dataset="SyntheticDA",
                   **{"MODEL.INIT_WEIGHTS": weights, "TEST.NO_TEST": True})
    trainer = build_trainer(cfg)
    import jax

    params_before = jax.tree_util.tree_map(
        np.asarray, trainer.state["params"]
    )
    trainer.train()
    # parameters unchanged; only the BN statistics were re-estimated
    for a, b in zip(
        jax.tree_util.tree_leaves(params_before),
        jax.tree_util.tree_leaves(trainer.state["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mcd(tmp_path):
    cfg = make_cfg(tmp_path, "MCD", dataset="SyntheticDA",
                   **{"TRAINER.MCD.N_STEP_F": 2})
    trainer = run_trainer(cfg)
    assert set(trainer.get_model_names()) == {"F", "C1", "C2"}


def test_mme(tmp_path):
    cfg = make_cfg(tmp_path, "MME", dataset="SyntheticDA")
    trainer = run_trainer(cfg)
    assert set(trainer.get_model_names()) == {"F", "C"}


def test_se(tmp_path):
    cfg = make_cfg(tmp_path, "SE", dataset="SyntheticDA",
                   **{"DATALOADER.K_TRANSFORMS": 2})
    run_trainer(cfg)


def test_m3sda(tmp_path):
    cfg = make_cfg(
        tmp_path, "M3SDA", dataset="SyntheticDA",
        **{
            "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
            "DATALOADER.TRAIN_X.N_DOMAIN": 2,
            "DATALOADER.TRAIN_U.SAME_AS_X": False,
            "DATASET.SOURCE_DOMAINS": ("a", "b"),
            "TRAINER.M3SDA.N_STEP_F": 2,
        },
    )
    trainer = run_trainer(cfg)
    batch = next(iter(trainer.dm.test_loader))
    out = trainer.model_inference(batch)
    assert out.shape[1] == trainer.num_classes


def test_dael(tmp_path):
    cfg = make_cfg(
        tmp_path, "DAEL", dataset="SyntheticDA",
        **{
            "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
            "DATALOADER.TRAIN_X.N_DOMAIN": 2,
            "DATALOADER.TRAIN_U.SAME_AS_X": False,
            "DATASET.SOURCE_DOMAINS": ("a", "b"),
            "TRAINER.DAEL.STRONG_TRANSFORMS": ("random_flip", "cutout"),
        },
    )
    trainer = run_trainer(cfg)
    batch = next(iter(trainer.dm.test_loader))
    out = trainer.model_inference(batch)
    # expert-ensemble probabilities
    np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-4)


def test_cdac(tmp_path):
    cfg = make_cfg(
        tmp_path, "CDAC", dataset="SyntheticDA",
        **{
            "DATALOADER.K_TRANSFORMS": 2,
            "TRAINER.CDAC.STRONG_TRANSFORMS": ("random_flip", "cutout"),
            "TEST.NO_TEST": True,
        },
    )
    run_trainer(cfg)


# ---- DG family -----------------------------------------------------------

def test_vanilla(tmp_path):
    cfg = make_cfg(tmp_path, "Vanilla", dataset="SyntheticDA")
    trainer = run_trainer(cfg)
    acc = trainer.test()
    assert 0.0 <= acc <= 100.0


def test_crossgrad(tmp_path):
    cfg = make_cfg(tmp_path, "CrossGrad", dataset="SyntheticDA",
                   **{"DATASET.SOURCE_DOMAINS": ("a", "b")})
    trainer = run_trainer(cfg)
    assert set(trainer.get_model_names()) == {"F", "D"}


def test_ddaig(tmp_path):
    cfg = make_cfg(
        tmp_path, "DDAIG", dataset="SyntheticDA",
        **{
            "TRAINER.DDAIG.G_ARCH": "fcn_3x32_gctx",
            "DATASET.SOURCE_DOMAINS": ("a", "b"),
        },
    )
    trainer = run_trainer(cfg)
    assert set(trainer.get_model_names()) == {"F", "D", "G"}


def test_daeldg(tmp_path):
    cfg = make_cfg(
        tmp_path, "DAELDG", dataset="SyntheticDA",
        **{
            "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
            "DATALOADER.TRAIN_X.N_DOMAIN": 2,
            "DATASET.SOURCE_DOMAINS": ("a", "b"),
            "TRAINER.DAELDG.STRONG_TRANSFORMS": ("random_flip", "cutout"),
        },
    )
    run_trainer(cfg)


@pytest.mark.parametrize("mix_type", ["random", "crossdomain"])
def test_domainmix(tmp_path, mix_type):
    cfg = make_cfg(tmp_path, "DomainMix", dataset="SyntheticDA",
                   **{"TRAINER.DOMAINMIX.TYPE": mix_type})
    run_trainer(cfg)


# ---- shared machinery ----------------------------------------------------

def test_trainer_checkpoint_roundtrip(tmp_path):
    """save_model -> fresh trainer -> resume restores epoch + params."""
    import jax

    cfg = make_cfg(tmp_path, "Vanilla", dataset="SyntheticDA",
                   **{"TRAIN.CHECKPOINT_FREQ": 1})
    trainer = run_trainer(cfg)
    p_trained = jax.tree_util.tree_map(np.asarray, trainer.state["params"])

    trainer2 = build_trainer(cfg)
    start = trainer2.resume_model_if_exist(cfg.OUTPUT_DIR)
    assert start == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(p_trained),
        jax.tree_util.tree_leaves(trainer2.state["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_count_iter_modes(tmp_path):
    for mode in ("train_x", "train_u", "smaller_one"):
        cfg = make_cfg(tmp_path, "SupBaseline",
                       **{"TRAIN.COUNT_ITER": mode, "TEST.NO_TEST": True,
                          "OUTPUT_DIR": str(tmp_path / f"out_{mode}")})
        run_trainer(cfg)
