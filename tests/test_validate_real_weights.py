"""scripts/validate_real_weights.sh is executed by CI, not just written.

The asset-day script (reference drivers ``eval.sh:1-22`` /
``scripts/mm_cls/eval_ovmr.sh:24-48``) cannot run for real here (zero
egress, no CLIP/generator weights), so this test runs it in a mocked mode:
synthetic asset files satisfy the gating, a PATH shim intercepts the
``python train.py`` invocations (recording their full flag matrix and
fabricating the reference-format ``log.txt``), and ``parse_test_res.py``
runs for real over the fabricated logs. Pins: the asset gate, the 11
datasets x 3 seeds eval matrix with the paper flags, the skip-if-exists
idempotence, and the end-to-end log-scrape aggregation.
"""

import os
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASETS = [
    "imagenet", "caltech101", "oxford_pets", "stanford_cars",
    "oxford_flowers", "food101", "fgvc_aircraft", "sun397", "dtd",
    "eurosat", "ucf101",
]


@pytest.fixture()
def work(tmp_path):
    """Mocked working dir: PATH shim + fake assets + parse_test_res.py."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    calls = tmp_path / "train_calls.log"
    shim = bin_dir / "python"
    shim.write_text(
        "#!/bin/bash\n"
        'if [ "$1" = "train.py" ]; then\n'
        "  shift\n"
        f'  echo "$@" >> "{calls}"\n'
        '  outdir=""\n'
        '  while [ $# -gt 0 ]; do\n'
        '    if [ "$1" = "--output-dir" ]; then outdir="$2"; shift 2; '
        "else shift; fi\n"
        "  done\n"
        '  mkdir -p "$outdir"\n'
        '  printf "=> result\\n* accuracy: 90.0%%\\n* error: 10.0%%\\n'
        '* macro_f1: 88.0%%\\n" > "$outdir/log.txt"\n'
        "  exit 0\n"
        "fi\n"
        f'exec "{sys.executable}" "$@"\n'
    )
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)

    ckpt = tmp_path / "ViT-B-16.pt"
    ckpt.write_bytes(b"fake clip checkpoint")
    model_dir = tmp_path / "checkpoints"
    (model_dir / "prompt_learner").mkdir(parents=True)
    (model_dir / "prompt_learner" / "model.pth.tar-30").write_bytes(b"fake")

    os.symlink(
        os.path.join(REPO, "parse_test_res.py"),
        tmp_path / "parse_test_res.py",
    )
    env = dict(
        os.environ,
        PATH=f"{bin_dir}:{os.environ['PATH']}",
        OVMR_CLIP_CKPT=str(ckpt),
    )
    return tmp_path, env, calls, model_dir


def run_script(tmp_path, env, model_dir):
    return subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "validate_real_weights.sh"),
         str(model_dir), "10"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )


def test_missing_asset_gate(work):
    tmp_path, env, _, model_dir = work
    env = dict(env, OVMR_CLIP_CKPT=str(tmp_path / "nope.pt"))
    proc = run_script(tmp_path, env, model_dir)
    assert proc.returncode == 1
    assert "MISSING ASSET" in proc.stdout


def test_eval_matrix_and_aggregation(work):
    tmp_path, env, calls, model_dir = work
    proc = run_script(tmp_path, env, model_dir)
    assert proc.returncode == 0, proc.stderr[-2000:]

    lines = calls.read_text().strip().splitlines()
    assert len(lines) == len(DATASETS) * 3  # 11 datasets x 3 seeds
    for line in lines:
        # the paper eval flags, every invocation
        assert "--trainer MM_CLS_OP" in line
        assert "--eval-only" in line
        assert "--eval_mode fusion" in line
        assert "--eval_tau 10" in line
        assert "--load-epoch 30" in line
        assert "--n_ctx 2" in line
        assert (
            "configs/trainers/MM_CLS_OP/"
            "vit_b16_c4_ep50_imagenet21k_pretrain.yaml" in line
        )
        assert "DATASET.NUM_SHOTS 16" in line
        assert "DATASET.SUBSAMPLE_CLASSES base" in line
    for ds in DATASETS:
        per_ds = [l for l in lines if f"configs/datasets/{ds}.yaml" in l]
        assert len(per_ds) == 3, f"{ds}: {len(per_ds)} seeds"
        seeds = sorted(
            l.split("--seed ")[1].split()[0] for l in per_ds
        )
        assert seeds == ["1", "2", "3"]

    # parse_test_res.py ran for real over the fabricated seed logs
    assert proc.stdout.count("Summary of directory (n=3)") == len(DATASETS)
    assert proc.stdout.count("* accuracy: 90.00% +- 0.00%") == len(DATASETS)
    assert "Compare the means above against BASELINE.md" in proc.stdout

    # idempotence: a re-run skips every existing output dir
    calls.write_text("")
    proc2 = run_script(tmp_path, env, model_dir)
    assert proc2.returncode == 0
    assert calls.read_text().strip() == ""
    assert proc2.stdout.count("skip ") == len(DATASETS) * 3


# dataset key in the script <-> BASELINE.md OVMR row label
_BASELINE_LABELS = {
    "imagenet": "ImageNet",
    "caltech101": "Caltech101",
    "oxford_pets": "OxfordPets",
    "stanford_cars": "StanfordCars",
    "oxford_flowers": "Flowers102",
    "food101": "Food101",
    "fgvc_aircraft": "FGVCAircraft",
    "sun397": "SUN397",
    "dtd": "DTD",
    "eurosat": "EuroSAT",
    "ucf101": "UCF101",
}


def test_inlined_expected_numbers_match_baseline_md():
    """The script's inlined paper numbers cross-check against BASELINE.md
    (VERDICT r4 item 9: the one command that matters on asset arrival must
    not rot against the source of truth)."""
    import re

    script = open(os.path.join(REPO, "scripts", "validate_real_weights.sh")).read()
    baseline = open(os.path.join(REPO, "BASELINE.md")).read()

    expected = {}
    for label in _BASELINE_LABELS.values():
        m = re.search(
            rf"\| OVMR — {re.escape(label)} \| ([0-9.]+) \|", baseline
        )
        assert m, f"BASELINE.md lost the OVMR {label} row"
        expected[label] = m.group(1)
    m = re.search(
        r"\| OVMR — \*\*11-dataset average\*\* \| \*\*([0-9.]+)\*\*", baseline
    )
    assert m, "BASELINE.md lost the OVMR average row"
    avg = m.group(1)

    # every per-dataset number appears next to its dataset key in BOTH the
    # header comment and the final echo summary
    for ds, label in _BASELINE_LABELS.items():
        val = expected[label]
        short = {
            "stanford_cars": "cars",
            "oxford_flowers": "flowers",
            "fgvc_aircraft": "aircraft",
        }.get(ds, ds)
        pat = rf"({re.escape(ds)}|{re.escape(short)}) {re.escape(val)}\b"
        hits = re.findall(pat, script)
        assert len(hits) >= 2, (
            f"{ds}: expected '{val}' beside the dataset name in both the "
            f"comment block and the echo summary of validate_real_weights.sh"
        )
    assert script.count(avg) >= 2, f"average {avg} missing from the script"
