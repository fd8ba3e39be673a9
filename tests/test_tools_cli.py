"""Dev-tool CLI contracts (reference
``Dassl.pytorch/tools/replace_text.py:1``)."""

import subprocess
import sys


def run_tool(*args):
    return subprocess.run(
        [sys.executable, "tools/replace_text.py", *map(str, args)],
        capture_output=True,
        text=True,
    )


def test_replace_text_recursive_ext_filter_and_single_file(tmp_path):
    (tmp_path / "sub").mkdir()
    a = tmp_path / "a.py"
    b = tmp_path / "sub" / "b.py"
    c = tmp_path / "notes.txt"
    a.write_text("old_name = old_name + 1\n")
    b.write_text("def old_name(): pass\n")
    c.write_text("old_name stays\n")

    r = run_tool(tmp_path, "old_name", "new_name")
    assert r.returncode == 0
    # reference contract: one `Processing <file>` line per visited file
    assert f"Processing {a}" in r.stdout
    assert f"Processing {b}" in r.stdout
    assert a.read_text() == "new_name = new_name + 1\n"
    assert b.read_text() == "def new_name(): pass\n"
    assert c.read_text() == "old_name stays\n"  # non-.py untouched

    # --ext switches the filter; single-file mode honors it too
    r2 = run_tool(tmp_path, "old_name", "gone", "--ext", ".txt")
    assert r2.returncode == 0
    assert c.read_text() == "gone stays\n"
    r3 = run_tool(c, "gone", "back")  # .txt file, default .py ext -> skip
    assert r3.returncode == 0 and c.read_text() == "gone stays\n"
    r4 = run_tool(a, "new_name", "final")
    assert r4.returncode == 0 and a.read_text() == "final = final + 1\n"


def test_replace_text_missing_path_errors(tmp_path):
    r = run_tool(tmp_path / "nope", "x", "y")
    assert r.returncode == 1
    assert "no such file or directory" in r.stderr
