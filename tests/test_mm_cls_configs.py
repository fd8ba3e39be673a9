"""The MM_CLS stage-2 config family under reference names
(``/root/reference`` ships 9 yamls in configs/trainers/MM_CLS/) and the
MM_CLS trainer alias for the stage-2 CoOp class."""

import glob
import os
import os.path as osp
import subprocess
import sys

import pytest

from ovmr_tpu.utils.config import CfgNode
from ovmr_tpu.utils.defaults import get_cfg_default

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

EXPECTED = [
    "vit_b16_c16_ep10_batch1.yaml",
    "vit_b16_c4_ep10_batch1_ctxv1.yaml",
    "vit_b16_c4_ep50_imagenet21k_pretrain.yaml",
    "vit_b16_c4_ep50_imagenet21k_pretrain_4ctx.yaml",
    "vit_b16_c4_ep50_imagenet21k_pretrain_8ctx.yaml",
    "vit_b16_c4_ep50_imagenet21k_pretrain_fv.yaml",
    "vit_b16_c8_ep10_batch1.yaml",
    "vit_b32_c4_ep50_imagenet21k_pretrain.yaml",
    "vit_b32_c4_ep50_imagenet21k_pretrain_ovd.yaml",
]


def test_mm_cls_family_complete():
    have = sorted(
        osp.basename(p)
        for p in glob.glob(osp.join(REPO, "configs/trainers/MM_CLS/*.yaml"))
    )
    assert have == EXPECTED


@pytest.mark.parametrize("fname", EXPECTED)
def test_mm_cls_yamls_merge(fname):
    cfg = get_cfg_default()
    cfg.merge_from_file(osp.join(REPO, "configs/trainers/MM_CLS", fname))
    assert cfg.INPUT.SIZE == (224, 224)
    assert cfg.TRAINER.COCOOP.PREC == "fp16"


def test_mm_cls_ovd_values():
    cfg = get_cfg_default()
    cfg.merge_from_file(
        osp.join(
            REPO,
            "configs/trainers/MM_CLS/vit_b32_c4_ep50_imagenet21k_pretrain_ovd.yaml",
        )
    )
    assert cfg.DATALOADER.TEST.BATCH_SIZE == 480
    assert cfg.DATALOADER.TEST.N_INS == 30
    assert cfg.OPTIM.LR == pytest.approx(5e-5)
    assert cfg.MODEL.BACKBONE.NAME == "ViT-B/32"


def test_mm_cls_trainer_alias():
    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.coop import CoOp
    from ovmr_tpu.engine.trainer import TRAINER_REGISTRY

    register_all_trainers()
    assert TRAINER_REGISTRY.get("MM_CLS") is CoOp
    assert TRAINER_REGISTRY.get("CoOp") is CoOp


def test_stage2_cli_via_mm_cls_config(tmp_path):
    """Reference-style stage-2 invocation: --trainer MM_CLS with
    --config-file configs/trainers/MM_CLS/vit_b16_c16_ep10_batch1.yaml
    (synthetic-data size/epoch overrides via opts)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "train.py",
            "--root", str(tmp_path / "data"),
            "--seed", "1",
            "--trainer", "MM_CLS",
            "--config-file", "configs/trainers/MM_CLS/vit_b16_c16_ep10_batch1.yaml",
            "--output-dir", out,
            # free-form opts last (REMAINDER contract)
            "DATASET.NAME", "Synthetic",
            "DATASET.NUM_SHOTS", "4",
            "INPUT.SIZE", "(32, 32)",
            "INPUT.TRANSFORMS", "['normalize']",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
            "DATALOADER.TEST.BATCH_SIZE", "16",
            "DATALOADER.TEST.N_INS", "4",
            "DATALOADER.NUM_WORKERS", "2",
            "MODEL.BACKBONE.NAME", "TINY",
            "OPTIM.MAX_EPOCH", "1",
            "TPU.DTYPE", "float32",
            "TEST.NO_TEST", "True",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    log = open(osp.join(out, "log.txt")).read()
    assert "Finish training" in log
    # the yaml's TRAINER.COCOOP node is inert for the stage-2 trainer (it
    # reads TRAINER.COOP, a documented reference quirk): COOP defaults hold
    assert 'Initial context: "X X X X X X X X X X X X X X X X" (n_ctx=16)' in log
    assert osp.exists(osp.join(out, "prompt_learner", "model-1.npz"))
