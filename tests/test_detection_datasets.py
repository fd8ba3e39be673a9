"""LVIS/COCO exemplar-crop loaders: directory layout, rare-index base/new
subsampling, and the OVD split-swap quirk."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.utils.defaults import get_cfg_default


def make_exemplar_tree(root, dataset_dir, labels, per_split=3, size=24):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for label in labels:
            d = osp.join(root, dataset_dir, split, str(label))
            os.makedirs(d, exist_ok=True)
            for i in range(per_split):
                arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(osp.join(d, f"crop{i}.jpg"))


def base_cfg(root, shots=-1, subsample="all"):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.DATASET.SUBSAMPLE_CLASSES = subsample
    cfg.SEED = 1
    return cfg


def test_lvis_loader_and_rare_split(tmp_path):
    from ovmr_tpu.data.datasets.detection import LVIS
    from ovmr_tpu.data.datasets.lvis_coco_classes import (
        LVIS_CLASSES, LVIS_RARE_INDEX,
    )

    # include two rare ids and two common ids
    rare = LVIS_RARE_INDEX[:2]
    common = [i for i in range(30) if i not in LVIS_RARE_INDEX][:2]
    labels = sorted(rare + common)
    make_exemplar_tree(tmp_path, "lvis_exemplars_mmovod_K30", labels)

    ds = LVIS(base_cfg(tmp_path))
    assert {d.label for d in ds.train_x} == set(labels)
    # classnames resolve from the 1203-entry vocabulary
    for d in ds.train_x:
        assert d.classname == LVIS_CLASSES[d.label]

    base = LVIS(base_cfg(tmp_path, subsample="base"))
    new = LVIS(base_cfg(tmp_path, subsample="new"))
    assert {d.classname for d in base.train_x} == {LVIS_CLASSES[i] for i in common}
    assert {d.classname for d in new.train_x} == {LVIS_CLASSES[i] for i in rare}
    # relabeled dense from 0
    assert sorted({d.label for d in new.train_x}) == [0, 1]


def test_lvis_ovd_split_swap(tmp_path):
    """NUM_SHOTS==5 with subsample 'all' swaps train/test (OVD export
    regime, reference lvis.py:70-73)."""
    from ovmr_tpu.data.datasets.detection import LVIS

    labels = [0, 1]
    make_exemplar_tree(tmp_path, "lvis_exemplars_mmovod_K30", labels, per_split=6)
    ds = LVIS(base_cfg(tmp_path, shots=5))
    # train_x comes from the 'val' directory after the swap
    assert all("/val/" in d.impath for d in ds.train_x)
    assert all("/train/" in d.impath for d in ds.test)


def test_coco_loader(tmp_path):
    from ovmr_tpu.data.datasets.detection import COCO
    from ovmr_tpu.data.datasets.lvis_coco_classes import COCO_CLASSES

    labels = [0, 1, 2]
    make_exemplar_tree(tmp_path, "coco_exemplars_mmovod_K30_final", labels)
    ds = COCO(base_cfg(tmp_path))
    assert ds.num_classes == 3
    assert ds.train_x[0].classname == COCO_CLASSES[ds.train_x[0].label]
    with pytest.raises(NotImplementedError):
        COCO(base_cfg(tmp_path, subsample="base"))
