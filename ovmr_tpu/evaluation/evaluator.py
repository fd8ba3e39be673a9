"""Classification evaluator.

Behavioral parity with the reference evaluator
(``dassl/evaluation/evaluator.py:50-173``): running accuracy, macro-F1
(sklearn, restricted to labels present in y_true), per-class accuracy / F1
CSV artifacts in OUTPUT_DIR, the exact ``=> result`` log block the result
parser scrapes, optional per-class breakdown and confusion matrix.
"""

from __future__ import annotations

import csv
import os.path as osp
from collections import OrderedDict, defaultdict
from typing import Dict, Optional

import numpy as np

from ovmr_tpu.utils.registry import Registry

EVALUATOR_REGISTRY = Registry("EVALUATOR")


def build_evaluator(cfg, lab2cname: Optional[Dict[int, str]] = None):
    return EVALUATOR_REGISTRY.get(cfg.TEST.EVALUATOR)(cfg, lab2cname=lab2cname)


@EVALUATOR_REGISTRY.register()
class Classification:
    def __init__(self, cfg, lab2cname: Optional[Dict[int, str]] = None):
        self.cfg = cfg
        self._lab2cname = lab2cname or {}
        self._per_class_res = defaultdict(list) if cfg.TEST.PER_CLASS_RESULT else None
        self.reset()

    def reset(self) -> None:
        self._correct = 0
        self._total = 0
        self._y_true = []
        self._y_pred = []
        if self._per_class_res is not None:
            self._per_class_res = defaultdict(list)

    def process(self, model_output, ground_truth, topk: int = 1) -> None:
        mo = np.asarray(model_output)
        gt = np.asarray(ground_truth)
        if topk == 1:
            pred = mo.argmax(axis=1)
            matches = (pred == gt).astype(np.float64)
        else:
            topk_pred = np.argsort(-mo, axis=1)[:, :topk]
            matches = (topk_pred == gt[:, None]).any(axis=1).astype(np.float64)
            pred = topk_pred[:, 0]
        self._correct += int(matches.sum())
        self._total += int(gt.shape[0])
        self._y_true.extend(gt.tolist())
        self._y_pred.extend(pred.tolist())
        if self._per_class_res is not None:
            for label, m in zip(gt.tolist(), matches.tolist()):
                self._per_class_res[label].append(int(m))

    def evaluate(self) -> "OrderedDict[str, float]":
        from sklearn.metrics import confusion_matrix, f1_score

        results = OrderedDict()
        acc = 100.0 * self._correct / max(self._total, 1)
        err = 100.0 - acc
        y_true = np.asarray(self._y_true)
        y_pred = np.asarray(self._y_pred)
        present = np.unique(y_true)

        # per-class acc CSV
        acc_by_class = {}
        for label in present:
            sel = y_true == label
            acc_by_class[str(label)] = 100.0 * (y_pred[sel] == label).mean()
        self._write_csv(
            "acc_per_class.csv", ["Label", "Acc"], sorted(acc_by_class.items())
        )

        f1_per_class = 100.0 * f1_score(
            y_true, y_pred, average=None, labels=present, zero_division=0
        )
        self._write_csv(
            "f1_per_class.csv", ["Label", "F1"], list(enumerate(f1_per_class))
        )

        macro_f1 = 100.0 * f1_score(
            y_true, y_pred, average="macro", labels=present, zero_division=0
        )

        results["accuracy"] = acc
        results["error_rate"] = err
        results["macro_f1"] = macro_f1

        print(
            "=> result\n"
            f"* total: {self._total:,}\n"
            f"* correct: {self._correct:,}\n"
            f"* accuracy: {acc:.1f}%\n"
            f"* error: {err:.1f}%\n"
            f"* macro_f1: {macro_f1:.1f}%"
        )

        if self._per_class_res is not None:
            print("=> per-class result")
            accs = []
            for label in sorted(self._per_class_res):
                res = self._per_class_res[label]
                pc_acc = 100.0 * sum(res) / len(res)
                accs.append(pc_acc)
                cname = self._lab2cname.get(label, str(label))
                print(
                    f"* class: {label} ({cname})\t"
                    f"total: {len(res):,}\t"
                    f"correct: {sum(res):,}\t"
                    f"acc: {pc_acc:.1f}%"
                )
            mean_acc = float(np.mean(accs))
            print(f"* average: {mean_acc:.1f}%")
            results["perclass_accuracy"] = mean_acc

        if self.cfg.TEST.COMPUTE_CMAT:
            cmat = confusion_matrix(y_true, y_pred, normalize="true")
            save_path = osp.join(self.cfg.OUTPUT_DIR, "cmat.pt")
            try:  # reference artifact format (torch.save, evaluator.py:166-169)
                import torch

                torch.save(cmat, save_path)
            except ImportError:
                save_path = osp.join(self.cfg.OUTPUT_DIR, "cmat.npy")
                np.save(save_path, cmat)
            print(f"Confusion matrix is saved to {save_path}")

        return results

    def _write_csv(self, filename, header, rows):
        try:
            path = osp.join(self.cfg.OUTPUT_DIR, filename)
            with open(path, "w", newline="") as f:
                writer = csv.writer(f, delimiter=",")
                writer.writerow(header)
                for key, value in rows:
                    writer.writerow([key, value])
        except OSError:
            pass
