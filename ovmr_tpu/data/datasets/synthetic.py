"""Synthetic dataset for tests, demos and benchmarking.

No reference counterpart: generates deterministic colored-noise images per
class on first use so the full pipeline (loader -> transform -> encode ->
classifier generation -> eval) runs anywhere with zero downloads.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from ovmr_tpu.utils.tools import mkdir_if_missing

from ..datum import DatasetBase, Datum, generate_fewshot_dataset, subsample_classes
from ..registry import DATASET_REGISTRY

_CLASSNAMES = [
    "red circle",
    "green square",
    "blue triangle",
    "yellow stripes",
    "purple dots",
    "orange grid",
    "cyan waves",
    "magenta noise",
]


def _make_image(rng: np.random.Generator, label: int, size: int) -> np.ndarray:
    base = np.zeros((size, size, 3), np.float32)
    hue = np.asarray(
        [
            [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0],
            [0.6, 0, 0.8], [1, 0.5, 0], [0, 0.9, 0.9], [1, 0, 1],
        ],
        np.float32,
    )[label % 8]
    base += hue * rng.uniform(0.4, 0.9)
    base += rng.normal(0, 0.08, base.shape).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size] / size
    pattern = [
        ((yy - 0.5) ** 2 + (xx - 0.5) ** 2) < 0.1,
        (abs(yy - 0.5) < 0.25) & (abs(xx - 0.5) < 0.25),
        yy > xx,
        (np.sin(yy * 20) > 0),
        ((np.sin(yy * 30) * np.sin(xx * 30)) > 0.5),
        ((np.sin(yy * 25) > 0) | (np.sin(xx * 25) > 0.5)),
        (np.sin((yy + xx) * 15) > 0),
        rng.uniform(size=(size, size)) > 0.5,
    ][label % 8]
    base[pattern] = 1.0 - base[pattern]
    return (np.clip(base, 0, 1) * 255).astype(np.uint8)


@DATASET_REGISTRY.register()
class Synthetic(DatasetBase):
    dataset_dir = "synthetic"

    def __init__(self, cfg, num_classes: int = 8, per_class: int = 24, size: int = 224):
        import os

        from PIL import Image

        # scale knobs for perf soaks (the registry instantiates with cfg
        # only): OVMR_SYNTHETIC=classes,per_class,size
        spec = os.environ.get("OVMR_SYNTHETIC")
        if spec:
            parts = spec.split(",")
            try:
                if len(parts) != 3:
                    raise ValueError
                num_classes, per_class, size = (int(v) for v in parts)
            except ValueError:
                raise ValueError(
                    f"OVMR_SYNTHETIC={spec!r} is malformed; expected "
                    "'classes,per_class,size' (three comma-separated ints, "
                    "e.g. '64,24,224')"
                ) from None

        root = osp.abspath(osp.expanduser(cfg.DATASET.ROOT or "/tmp/ovmr_data"))
        base = osp.join(root, type(self).dataset_dir, f"c{num_classes}_n{per_class}_s{size}")
        rng = np.random.default_rng(0)

        items = []
        for label in range(num_classes):
            cname = _CLASSNAMES[label % len(_CLASSNAMES)]
            cdir = osp.join(base, f"{label:03d}")
            mkdir_if_missing(cdir)
            for i in range(per_class):
                path = osp.join(cdir, f"{i:04d}.png")
                if not osp.exists(path):
                    Image.fromarray(_make_image(rng, label, size)).save(path)
                items.append(Datum(impath=path, label=label, classname=cname))

        per = per_class
        train = [d for i, d in enumerate(items) if i % per < per // 2]
        val = [d for i, d in enumerate(items) if per // 2 <= i % per < (3 * per) // 4]
        test = [d for i, d in enumerate(items) if i % per >= (3 * per) // 4]

        if cfg.DATASET.NUM_SHOTS >= 1:
            import random as _random

            # seeded few-shot sampling: deterministic per cfg.SEED without
            # relying on the global RNG state at construction time
            train = generate_fewshot_dataset(
                train,
                num_shots=cfg.DATASET.NUM_SHOTS,
                rng=_random.Random(max(cfg.SEED, 0)),
            )
        train, val, test = subsample_classes(
            train, val, test, subsample=cfg.DATASET.SUBSAMPLE_CLASSES
        )
        super().__init__(train_x=train, val=val, test=test, eval_set=train)


@DATASET_REGISTRY.register()
class SyntheticSSL(Synthetic):
    """Semi-supervised variant: the train split is divided into a labeled
    part (``DATASET.NUM_LABELED`` items, default half) and an unlabeled
    ``train_u`` pool — the shape of the reference SSL datasets
    (``dassl/data/datasets/ssl/cifar.py``)."""

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        full = self.train_x
        n_labeled = cfg.DATASET.NUM_LABELED
        if n_labeled <= 0:
            n_labeled = len(full) // 2
        self.train_x = full[:n_labeled]
        self.train_u = [
            Datum(impath=d.impath, label=d.label, classname=d.classname)
            for d in (full if cfg.DATASET.ALL_AS_UNLABELED else full[n_labeled:])
        ]
        self.eval_set = self.train_x


@DATASET_REGISTRY.register()
class SyntheticDA(Synthetic):
    """Domain-adaptation variant: train_x becomes the source domains
    (domain ids cycle over ``len(DATASET.SOURCE_DOMAINS)`` or 2) and the
    val split doubles as the unlabeled target pool ``train_u`` (domain =
    n_sources), mirroring the reference DA datasets' source/target split
    (``dassl/data/datasets/da/``)."""

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg, **kwargs)
        n_dom = max(len(cfg.DATASET.SOURCE_DOMAINS), 2)
        self.train_x = [
            Datum(impath=d.impath, label=d.label, domain=i % n_dom,
                  classname=d.classname)
            for i, d in enumerate(self.train_x)
        ]
        self.train_u = [
            Datum(impath=d.impath, label=d.label, domain=n_dom,
                  classname=d.classname)
            for d in self.val
        ]
        self.eval_set = self.train_x
