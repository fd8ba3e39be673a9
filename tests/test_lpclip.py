"""lpclip baseline: feature-dump format + linear-probe report round trip.

Pins the reference contracts end-to-end (reference
``lpclip/feat_extractor.py:105-167`` and ``lpclip/linear_probe.py:27-129``):
the npz artifact is ``{OUTPUT_DIR}/{DATASET}/{split}.npz`` with keys
``feature_list``/``label_list``, and the probe consumes exactly that layout
and writes ``report/{dataset}.txt`` lines ``"{ds}, {k} shot: m +- s"``.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def feature_dir(tmp_path_factory):
    """Run the real feat_extractor CLI over all three Synthetic splits."""
    tmp = tmp_path_factory.mktemp("lpclip")
    out = tmp / "feats"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        OVMR_SYNTHETIC="8,12,32",  # 8 classes, 12 imgs/class, 32px
    )
    for split in ("train", "val", "test"):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "lpclip", "feat_extractor.py"),
                "--root", str(tmp / "data"),
                "--split", split,
                "--output-dir", str(out),
                "--backbone", "TINY",
                "--seed", "1",
                "DATASET.NAME", "Synthetic",
                "INPUT.SIZE", "(32,32)",
                "DATALOADER.NUM_WORKERS", "2",
                "TPU.DTYPE", "float32",
            ],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert f"{split}.npz" in proc.stdout
    return out / "Synthetic"


def test_npz_format(feature_dir):
    # Synthetic split sizes: per_class=12 -> 6 train / 3 val / 3 test
    for split, per in (("train", 6), ("val", 3), ("test", 3)):
        data = np.load(feature_dir / f"{split}.npz")
        assert set(data.files) == {"feature_list", "label_list"}
        feats, labels = data["feature_list"], data["label_list"]
        assert feats.shape == (8 * per, 64)  # TINY embed_dim
        assert labels.shape == (8 * per,)
        assert sorted(np.unique(labels)) == list(range(8))
        # the reference dumps RAW (not unit-norm) visual features
        norms = np.linalg.norm(feats, axis=-1)
        assert not np.allclose(norms, 1.0, atol=1e-3)
        assert np.isfinite(feats).all()


def test_linear_probe_report(feature_dir, tmp_path):
    """The probe consumes the dumped npz layout and writes the reference
    report format; C-grid + binary search exercised at reduced steps."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "lpclip", "linear_probe.py"),
            "--dataset", "Synthetic",
            "--feature_dir", str(feature_dir.parent),
            "--num_run", "2",
            "--num_step", "2",
            "--shots", "1", "4",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # per-step progress lines: "<ds>, seed <s>, <k> shot, C <c>, test_acc <a>"
    assert re.search(
        r"Synthetic, seed 1, 1 shot, C [\d.e+-]+, test_acc \d", proc.stdout
    )
    report = tmp_path / "report" / "Synthetic.txt"
    assert report.exists()
    lines = report.read_text().strip().splitlines()
    assert len(lines) == 2
    for line, shot in zip(lines, (1, 4)):
        m = re.fullmatch(
            rf"Synthetic, {shot} shot: (\d+\.\d\d) \+- (\d+\.\d\d)", line
        )
        assert m, f"malformed report line: {line!r}"
        assert 0.0 <= float(m.group(1)) <= 100.0


def test_mesh_feature_dump_matches_single_device(feature_dir, tmp_path):
    """The mesh-aware extractor (shared setup_trainer_mesh policy,
    batches shard_map'd over 'data') dumps features identical to the
    single-device run — lpclip scales over the mesh like every other
    surface."""
    out = tmp_path / "feats_mesh"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        OVMR_SYNTHETIC="8,12,32",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "lpclip", "feat_extractor.py"),
            "--root", str(tmp_path / "data"),
            "--split", "test",
            "--output-dir", str(out),
            "--backbone", "TINY",
            "--seed", "1",
            "DATASET.NAME", "Synthetic",
            "INPUT.SIZE", "(32,32)",
            "DATALOADER.NUM_WORKERS", "2",
            "TPU.DTYPE", "float32",
            "TPU.MESH.DATA", "8",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "data-parallel mesh" in proc.stdout, proc.stdout[-1000:]
    got = np.load(out / "Synthetic" / "test.npz")
    ref = np.load(feature_dir / "test.npz")
    np.testing.assert_array_equal(got["label_list"], ref["label_list"])
    np.testing.assert_allclose(
        got["feature_list"], ref["feature_list"], atol=2e-6, rtol=2e-6
    )
