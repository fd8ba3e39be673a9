"""CLI end-to-end: `python train.py` trains on the synthetic dataset and
`--eval-only` reloads the checkpoint and writes the result artifacts."""

import json
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_cli(args, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # may be overridden by sitecustomize; the
    # trainers run fine either way, CPU keeps CI deterministic
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "train.py"] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )



def test_cli_train_and_eval(tmp_path):
    out_train = str(tmp_path / "train_out")
    flags = [
        "--root", str(tmp_path / "data"),
        "--seed", "1",
        "--trainer", "MM_CLS_OP",
        "--n_ctx", "2",
    ]
    # free-form KEY VALUE opts must come last (argparse REMAINDER, same
    # contract as the reference CLI)
    opts = [
        "DATASET.NAME", "Synthetic",
        "DATASET.NUM_SHOTS", "4",
        "INPUT.SIZE", "(32, 32)",
        "INPUT.TRANSFORMS", "['normalize']",
        "DATALOADER.TRAIN_X.SAMPLER", "RandomClassSampler",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "16",
        "DATALOADER.TRAIN_X.N_INS", "4",
        "DATALOADER.TEST.BATCH_SIZE", "16",
        "DATALOADER.NUM_WORKERS", "2",
        "MODEL.BACKBONE.NAME", "TINY",
        "OPTIM.MAX_EPOCH", "1",
        "TRAIN.CHECKPOINT_FREQ", "1",
        "TPU.DTYPE", "float32",
    ]
    r = run_cli(["--output-dir", out_train] + flags + opts + ["TEST.NO_TEST", "True"])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert osp.exists(osp.join(out_train, "log.txt"))
    assert "Finish training" in open(osp.join(out_train, "log.txt")).read()
    assert osp.exists(osp.join(out_train, "prompt_learner", "model-1.npz"))

    out_eval = str(tmp_path / "eval_out")
    r2 = run_cli(
        [
            "--output-dir", out_eval,
            "--model-dir", out_train,
            "--load-epoch", "1",
            "--eval-only",
            "--eval_mode", "fusion",
            "--eval_tau", "10",
        ]
        + flags
        + opts
    )
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    log = open(osp.join(out_eval, "log.txt")).read()
    assert "=> result" in log and "* accuracy:" in log
    assert osp.exists(osp.join(out_eval, "mm_classifiers.pt"))
    assert osp.exists(osp.join(out_eval, "acc_per_class.csv"))

    # parse_test_res consumes the log (seed-dir layout)
    import shutil

    agg_dir = tmp_path / "agg" / "seed1"
    agg_dir.mkdir(parents=True)
    shutil.copy(osp.join(out_eval, "log.txt"), agg_dir / "log.txt")
    r3 = subprocess.run(
        [sys.executable, "parse_test_res.py", str(tmp_path / "agg"), "--test-log"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r3.returncode == 0, r3.stdout + r3.stderr
    assert "accuracy" in r3.stdout


def test_cli_dassl_trainer_with_yaml(tmp_path):
    """A vendored-Dassl-family trainer (DG Vanilla) runs through the real
    CLI surface with one of the ported trainer yamls
    (`configs/trainers/dg/vanilla/digits_dg.yaml`), pinning the
    yaml -> 4-layer merge -> TRAINER_REGISTRY -> epoch loop -> `=> result`
    seam for the D19-D22 subsystems (reference `dassl/tools/train.py`)."""
    out = str(tmp_path / "dg_out")
    r = run_cli(
        [
            "--root", str(tmp_path / "data"),
            "--seed", "1",
            "--trainer", "Vanilla",
            "--config-file", "configs/trainers/dg/vanilla/digits_dg.yaml",
            "--output-dir", out,
            "DATASET.NAME", "SyntheticDA",
            "INPUT.SIZE", "(32, 32)",
            "MODEL.BACKBONE.NAME", "cnn_digitsdg",
            "MODEL.BACKBONE.PRETRAINED", "False",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
            "DATALOADER.TEST.BATCH_SIZE", "8",
            "DATALOADER.NUM_WORKERS", "2",
            "OPTIM.MAX_EPOCH", "1",
        ],
        env_extra={"OVMR_SYNTHETIC": "4,8,32"},
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    log = open(osp.join(out, "log.txt")).read()
    # the yaml's OPTIM section merged (sgd @ 0.05), training ran, and the
    # deploy-last-epoch eval produced the reference result block
    assert "Finish training" in log
    assert "=> result" in log and "* accuracy:" in log
    assert osp.exists(osp.join(out, "model", "checkpoint"))


def test_cli_resnet_backbone_eval(tmp_path):
    """The full trainer surface runs with a ModifiedResNet backbone by
    name (TINY_RN smoke init; real RN50..RN50x64 load via checkpoints):
    zero-shot eval writes the `=> result` block end-to-end."""
    out = str(tmp_path / "zs_rn")
    res = run_cli(
        [
            "--root", str(tmp_path / "data"),
            "--seed", "1",
            "--trainer", "ZeroshotCLIP",
            "--output-dir", out,
            "--eval-only",
            "DATASET.NAME", "Synthetic",
            "DATASET.NUM_SHOTS", "4",
            "INPUT.SIZE", "(64, 64)",
            "INPUT.TRANSFORMS", "['normalize']",
            "DATALOADER.TEST.BATCH_SIZE", "16",
            "DATALOADER.NUM_WORKERS", "2",
            "MODEL.BACKBONE.NAME", "TINY_RN",
            "TPU.DTYPE", "float32",
        ]
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    log = open(osp.join(out, "log.txt")).read()
    assert "=> result" in log
    assert "* accuracy:" in log
