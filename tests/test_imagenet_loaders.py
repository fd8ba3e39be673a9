"""ImageNet-family loaders on synthetic directory trees: classnames.txt
mapping, folder scan, preprocessed.pkl cache, few-shot cache, variants."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.utils.defaults import get_cfg_default

FOLDERS = ["n01440764", "n01443537", "n01484850"]
NAMES = ["tench", "goldfish", "great white shark"]


def write_images(d, n=3, size=20):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(osp.join(d, f"im{i}.JPEG"))


def make_imagenet(root):
    base = osp.join(root, "imagenet")
    with open(osp.join(os.makedirs(base, exist_ok=True) or base, "classnames.txt"), "w") as f:
        for folder, name in zip(FOLDERS, NAMES):
            f.write(f"{folder} {name}\n")
    for split in ("train", "val"):
        for folder in FOLDERS:
            write_images(osp.join(base, "images", split, folder))


def cfg_for(root, shots=2):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.SEED = 1
    return cfg


def test_imagenet_loader_and_caches(tmp_path):
    from ovmr_tpu.data.datasets.imagenet import ImageNet

    make_imagenet(tmp_path)
    ds = ImageNet(cfg_for(tmp_path))
    assert ds.num_classes == 3
    assert ds.classnames == NAMES  # sorted-folder order maps to classnames
    counts = {}
    for d in ds.train_x:
        counts[d.label] = counts.get(d.label, 0) + 1
    assert counts == {0: 2, 1: 2, 2: 2}
    # eval_set is the few-shot train split (exemplar source)
    assert ds.eval_set == ds.train_x

    # caches exist and a second load reuses them
    assert osp.exists(tmp_path / "imagenet" / "preprocessed.pkl")
    assert osp.exists(
        tmp_path / "imagenet" / "split_fewshot" / "shot_2-seed_1.pkl"
    )
    ds2 = ImageNet(cfg_for(tmp_path))
    assert [d.impath for d in ds2.train_x] == [d.impath for d in ds.train_x]


def test_imagenet_base_new(tmp_path):
    from ovmr_tpu.data.datasets.imagenet import ImageNet

    make_imagenet(tmp_path)
    cfg = cfg_for(tmp_path)
    cfg.DATASET.SUBSAMPLE_CLASSES = "base"
    base = ImageNet(cfg)
    assert base.num_classes == 2  # ceil(3/2)
    assert base.classnames == NAMES[:2]


def test_imagenet_sketch_variant(tmp_path):
    from ovmr_tpu.data.datasets.imagenet import ImageNetSketch

    base = osp.join(tmp_path, "imagenet-sketch")
    os.makedirs(base, exist_ok=True)
    with open(osp.join(base, "classnames.txt"), "w") as f:
        for folder, name in zip(FOLDERS, NAMES):
            f.write(f"{folder} {name}\n")
    # only 2 of 3 classes present -> labels must be dense 0..1
    for folder in FOLDERS[:2]:
        write_images(osp.join(base, "images", folder))

    ds = ImageNetSketch(cfg_for(tmp_path, shots=-1))
    assert sorted({d.label for d in ds.test}) == [0, 1]
    assert {d.classname for d in ds.test} == set(NAMES[:2])
