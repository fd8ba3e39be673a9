"""TB writer: real tf.summary backend, quiet init, loud-once degrade
(reference contract ``dassl/engine/trainer.py:240-255``)."""

import os
import sys

import pytest


def test_writer_writes_event_file_quietly(tmp_path, capfd):
    from ovmr_tpu.utils import tensorboard as tb

    w = tb.SummaryWriter(str(tmp_path))
    if w._writer is None:
        pytest.skip("tensorflow unavailable in this environment")
    w.add_scalar("train/loss", 1.25, 3)
    w.flush()
    w.close()
    files = os.listdir(tmp_path)
    assert any("tfevents" in f for f in files), files
    # the import-time CUDA probe / oneDNN banners must not leak to fd 2
    # (round-4 finding: the MULTICHIP tail led with `failed call to cuInit`)
    captured = capfd.readouterr()
    assert "cuInit" not in captured.err
    assert "oneDNN" not in captured.err


def test_disabled_writer_warns_once_then_noops(tmp_path, capfd, monkeypatch):
    from ovmr_tpu.utils import tensorboard as tb

    # poison the import so SummaryWriter's `import tensorflow` raises
    monkeypatch.setitem(sys.modules, "tensorflow", None)
    monkeypatch.setattr(tb, "_WARNED_DISABLED", False)
    w = tb.SummaryWriter(str(tmp_path / "a"))
    assert w._writer is None
    err1 = capfd.readouterr().err
    assert "tensorboard logging DISABLED" in err1
    # no-op surface stays usable
    w.add_scalar("x", 1.0, 0)
    w.flush()
    w.close()
    # the notice fires ONCE per process, not per writer
    w2 = tb.SummaryWriter(str(tmp_path / "b"))
    assert w2._writer is None
    assert "DISABLED" not in capfd.readouterr().err
