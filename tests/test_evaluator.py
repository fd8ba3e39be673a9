"""Classification evaluator: metrics, CSV artifacts, per-class results,
confusion matrix artifact, topk."""

import os
import os.path as osp

import numpy as np
import pytest

from ovmr_tpu.evaluation import Classification, build_evaluator
from ovmr_tpu.utils.defaults import get_cfg_default


def make_cfg(tmp, per_class=False, cmat=False):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp)
    cfg.TEST.PER_CLASS_RESULT = per_class
    cfg.TEST.COMPUTE_CMAT = cmat
    return cfg


def test_metrics_and_csvs(tmp_path):
    ev = Classification(make_cfg(tmp_path), lab2cname={0: "a", 1: "b"})
    logits = np.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4], [0.3, 0.7]])
    labels = np.asarray([0, 1, 1, 1])
    ev.process(logits, labels)
    results = ev.evaluate()
    assert results["accuracy"] == 75.0
    assert results["error_rate"] == 25.0
    assert 0 < results["macro_f1"] <= 100
    assert osp.exists(tmp_path / "acc_per_class.csv")
    assert osp.exists(tmp_path / "f1_per_class.csv")


def test_per_class_and_cmat(tmp_path, capsys):
    ev = Classification(
        make_cfg(tmp_path, per_class=True, cmat=True), lab2cname={0: "a", 1: "b"}
    )
    ev.process(np.asarray([[1.0, 0.0], [0.0, 1.0]]), np.asarray([0, 1]))
    results = ev.evaluate()
    out = capsys.readouterr().out
    assert "per-class result" in out
    assert results["perclass_accuracy"] == 100.0
    # reference artifact format: torch-saved cmat.pt
    import torch

    cmat = torch.load(tmp_path / "cmat.pt", weights_only=False)
    np.testing.assert_allclose(np.asarray(cmat), np.eye(2))


def test_topk():
    ev = Classification(make_cfg("/tmp"), lab2cname={})
    logits = np.asarray([[0.5, 0.4, 0.1], [0.1, 0.5, 0.4]])
    labels = np.asarray([1, 2])  # both are second-best -> top1 0%, top2 100%
    ev.process(logits, labels, topk=2)
    assert ev._correct == 2


def test_log_block_matches_parser(tmp_path, capsys):
    """The '=> result' block satisfies parse_test_res's regex contract."""
    import re

    ev = Classification(make_cfg(tmp_path), lab2cname={})
    ev.process(np.asarray([[1.0, 0.0]]), np.asarray([0]))
    ev.evaluate()
    out = capsys.readouterr().out
    assert "=> result" in out
    m = re.search(r"\* accuracy: ([\.\deE+-]+)%", out)
    assert m and float(m.group(1)) == 100.0
