"""Recursive in-place text replacement over source files.

Counterpart of the reference dev utility
``Dassl.pytorch/tools/replace_text.py:1`` (same CLI contract: positional
``file_or_dir text_to_search replacement_text`` plus ``--ext``, default
``.py``; prints ``Processing <file>`` per rewritten file). Fresh
implementation on pathlib — no fileinput, no recursion.

Usage:
    python tools/replace_text.py <file_or_dir> <old> <new> [--ext .py]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def rewrite_file(path: Path, old: str, new: str) -> None:
    print(f"Processing {path}")
    text = path.read_text(encoding="utf-8")
    replaced = text.replace(old, new)
    if replaced != text:
        path.write_text(replaced, encoding="utf-8")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("file_or_dir", type=str, help="path to file or directory")
    ap.add_argument("text_to_search", type=str, help="name to be replaced")
    ap.add_argument("replacement_text", type=str, help="new name")
    ap.add_argument("--ext", type=str, default=".py", help="file extension")
    args = ap.parse_args(argv)

    target = Path(args.file_or_dir)
    if target.is_file():
        if target.suffix == args.ext:
            rewrite_file(target, args.text_to_search, args.replacement_text)
        return 0
    if target.is_dir():
        for path in sorted(target.rglob(f"*{args.ext}")):
            if path.is_file():
                rewrite_file(
                    path, args.text_to_search, args.replacement_text
                )
        return 0
    print(f"no such file or directory: {target}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
