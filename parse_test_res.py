"""Aggregate eval results across seed directories.

Port of the reference ``parse_test_res.py:60-176``: scrape ``* metric: X%``
lines from ``log.txt`` files under ``{directory}/seed*/``, require the
end-signal (``Finish training`` or ``=> result``), report mean and std (or a
95% confidence interval with --ci95).

Usage:
  python parse_test_res.py <directory> [--ci95] [--test-log]
  python parse_test_res.py <directory> --multi-exp
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
from collections import defaultdict

import numpy as np


def compute_ci95(values) -> float:
    return 1.96 * np.std(values) / np.sqrt(len(values))


def parse_dir(directory: str, end_signal: str, keyword: str = "accuracy"):
    """Parse every seed*/log.txt* under `directory`; returns {metric: [vals]}."""
    print(f"Parsing files in {directory}")
    subdirs = sorted(
        d for d in os.listdir(directory)
        if osp.isdir(osp.join(directory, d)) and d.startswith("seed")
    )
    metric_re = re.compile(r"\* ([\w_]+): ([\.\deE+-]+)%")
    outputs = []
    for sub in subdirs:
        logs = sorted(
            f for f in os.listdir(osp.join(directory, sub)) if f.startswith("log.txt")
        )
        if not logs:
            continue
        fpath = osp.join(directory, sub, logs[-1])
        good_to_go = False
        output = {}
        with open(fpath, "r", errors="ignore") as f:
            for line in f:
                if end_signal in line:
                    good_to_go = True
                m = metric_re.search(line)
                if m and good_to_go:
                    output[m.group(1)] = float(m.group(2))
        if output:
            print(f"file: {fpath}. " + ". ".join(f"{k}: {v:.2f}%" for k, v in output.items()))
            outputs.append(output)

    assert outputs, f"Nothing found in {directory}"
    grouped = defaultdict(list)
    for output in outputs:
        for k, v in output.items():
            grouped[k].append(v)
    return grouped


def summarize(grouped, ci95: bool = False):
    print("===")
    print(f"Summary of directory (n={len(next(iter(grouped.values())))}):")
    results = {}
    for key, values in grouped.items():
        avg = float(np.mean(values))
        if ci95:
            spread = compute_ci95(values)
            print(f"* {key}: {avg:.2f}% +- {spread:.2f}%")
        else:
            spread = float(np.std(values))
            print(f"* {key}: {avg:.2f}% +- {spread:.2f}%")
        results[key] = avg
    print("===")
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", type=str)
    parser.add_argument("--ci95", action="store_true")
    parser.add_argument("--test-log", action="store_true", help="use '=> result' as end signal")
    parser.add_argument("--multi-exp", action="store_true", help="aggregate over subdirectories")
    parser.add_argument("--keyword", default="accuracy")
    args = parser.parse_args()

    end_signal = "=> result" if args.test_log else "Finish training"

    if args.multi_exp:
        final = defaultdict(list)
        for sub in sorted(os.listdir(args.directory)):
            path = osp.join(args.directory, sub)
            if not osp.isdir(path):
                continue
            grouped = parse_dir(path, end_signal, keyword=args.keyword)
            results = summarize(grouped, ci95=args.ci95)
            for k, v in results.items():
                final[k].append(v)
        print("Average performance across experiments:")
        for k, values in final.items():
            print(f"* {k}: {np.mean(values):.2f}%")
    else:
        grouped = parse_dir(args.directory, end_signal, keyword=args.keyword)
        summarize(grouped, ci95=args.ci95)


if __name__ == "__main__":
    main()
