"""Data layer: samplers, class subsampling, few-shot caching (incl. reference
pickle compat), transforms, and the synthetic end-to-end loader."""

import os
import pickle

import numpy as np
import pytest

from ovmr_tpu.data import (
    DataManager,
    Datum,
    build_sampler,
    build_transform,
    generate_fewshot_dataset,
    load_fewshot_pickle,
    subsample_classes,
)
from ovmr_tpu.utils.defaults import get_cfg_default


def make_items(num_classes=5, per_class=6):
    return [
        Datum(impath=f"/x/{c}_{i}.jpg", label=c, classname=f"class{c}")
        for c in range(num_classes)
        for i in range(per_class)
    ]


def test_random_class_sampler_groups():
    items = make_items(5, 6)
    sampler = build_sampler("RandomClassSampler", items, batch_size=6, n_ins=3)
    rng = np.random.default_rng(0)
    idx = sampler.epoch_indices(rng)
    # full epoch: every class contributes floor(6/3)=2 groups of 3
    assert len(idx) == 30
    labels = np.asarray([items[i].label for i in idx])
    for start in range(0, len(idx), 3):
        grp = labels[start : start + 3]
        assert (grp == grp[0]).all()
    # coverage: every item index exactly once
    assert sorted(idx.tolist()) == list(range(30))


def test_random_class_sampler_short_class_resamples():
    items = make_items(2, 2)  # fewer than n_ins=4
    sampler = build_sampler("RandomClassSampler", items, batch_size=8, n_ins=4)
    idx = sampler.epoch_indices(np.random.default_rng(1))
    labels = np.asarray([items[i].label for i in idx])
    assert len(idx) == 8
    for start in range(0, 8, 4):
        grp = labels[start : start + 4]
        assert (grp == grp[0]).all()


def test_subsample_classes_base_new():
    items = make_items(5, 2)
    (base,) = subsample_classes(items, subsample="base")
    (new,) = subsample_classes(items, subsample="new")
    # 5 classes -> base = first ceil(5/2)=3, new = last 2, both relabeled
    assert sorted({d.label for d in base}) == [0, 1, 2]
    assert sorted({d.label for d in new}) == [0, 1]
    assert {d.classname for d in base} == {"class0", "class1", "class2"}
    assert {d.classname for d in new} == {"class3", "class4"}


def test_generate_fewshot():
    items = make_items(4, 10)
    few = generate_fewshot_dataset(items, num_shots=3)
    counts = {}
    for d in few:
        counts[d.label] = counts.get(d.label, 0) + 1
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_reference_pickle_compat(tmp_path):
    """A pickle containing dassl-style Datum objects loads into our Datums."""

    class Datum:  # mimics dassl Datum pickle layout
        def __init__(self, impath, label, classname):
            self._impath = impath
            self._label = label
            self._domain = 0
            self._classname = classname

    import sys, types

    # pickle imports the whole module chain; register every parent
    for name in (
        "dassl",
        "dassl.data",
        "dassl.data.datasets",
        "dassl.data.datasets.base_dataset",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    mod = sys.modules["dassl.data.datasets.base_dataset"]
    mod.Datum = Datum
    Datum.__module__ = "dassl.data.datasets.base_dataset"
    Datum.__qualname__ = "Datum"

    data = {"train": [Datum("/a/b.jpg", 3, "cat")]}
    p = tmp_path / "shot_16-seed_1.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    del sys.modules["dassl.data.datasets.base_dataset"]

    loaded = load_fewshot_pickle(str(p))
    d = loaded["train"][0]
    assert d.impath == "/a/b.jpg" and d.label == 3 and d.classname == "cat"


def test_transforms_shapes():
    from PIL import Image

    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (224, 224)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.INPUT.RRCROP_SCALE = (0.25, 1.0)
    cfg.INPUT.TRANSFORMS = [
        "random_resized_crop", "random_flip", "colorjitter", "gaussian_noise", "normalize",
    ]
    img = Image.fromarray(
        (np.random.RandomState(0).rand(300, 400, 3) * 255).astype(np.uint8)
    )
    tr = build_transform(cfg, is_train=True)
    te = build_transform(cfg, is_train=False)
    a = tr(img)
    b = te(img)
    assert a.shape == (3, 224, 224) and a.dtype == np.float32
    assert b.shape == (3, 224, 224)


def test_test_transform_matches_torchvision_semantics():
    """Resize(smaller edge)+CenterCrop+Normalize vs a manual PIL reference."""
    from PIL import Image

    from ovmr_tpu.data.transforms import (
        CLIP_MEAN, CLIP_STD, center_crop, normalize, resize_smaller_edge, to_chw_float,
    )

    img = Image.fromarray(
        (np.random.RandomState(1).rand(240, 320, 3) * 255).astype(np.uint8)
    )
    out = resize_smaller_edge(img, 224)
    # torchvision Resize(224) on 320x240: long edge = int(224*320/240) =
    # 298 (TRUNCATION, not rounding — _compute_resized_output_size)
    assert min(out.size) == 224 and out.size == (298, 224)
    crop = center_crop(out, (224, 224))
    assert crop.size == (224, 224)
    arr = normalize(to_chw_float(crop), CLIP_MEAN, CLIP_STD)
    assert np.isfinite(arr).all()


def test_synthetic_pipeline(tmp_path):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 4
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["normalize"]
    cfg.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TRAIN_X.N_INS = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.DATALOADER.NUM_WORKERS = 2

    dm = DataManager(cfg)
    assert dm.num_classes == 8
    batch = next(iter(dm.train_loader_x))
    assert batch["img"].shape == (8, 3, 32, 32)
    labels = batch["label"].reshape(2, 4)
    assert (labels == labels[:, :1]).all()

    # eval_set loader groups NUM_SHOTS per class
    eval_batch = next(iter(dm.eval_set_loader))
    el = eval_batch["label"].reshape(-1, 4)
    assert (el == el[:, :1]).all()


def test_random_full_class_sampler():
    from ovmr_tpu.data import build_sampler

    items = make_items(3, 5)
    sampler = build_sampler("RandomFullClassSampler", items, batch_size=10, n_ins=5)
    idx = sampler.epoch_indices(np.random.default_rng(0))
    # every item exactly once, grouped per class
    assert sorted(idx.tolist()) == list(range(15))
    labels = np.asarray([items[i].label for i in idx]).reshape(3, 5)
    assert (labels == labels[:, :1]).all()


def test_loader_drop_last():
    from PIL import Image
    import tempfile, os

    from ovmr_tpu.data import Datum
    from ovmr_tpu.data.manager import HostDataLoader
    from ovmr_tpu.data.samplers import build_sampler

    d = tempfile.mkdtemp()
    items = []
    for i in range(7):
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
        items.append(Datum(impath=p, label=0, classname="x"))
    sampler = build_sampler("SequentialSampler", items, 0)
    keep = HostDataLoader(items, sampler, None, batch_size=3, num_workers=1)
    drop = HostDataLoader(items, sampler, None, batch_size=3, num_workers=1, drop_last=True)
    assert len(keep) == 3 and len(drop) == 2
    sizes = [b["img"].shape[0] for b in keep]
    assert sizes == [3, 3, 1]
    sizes_d = [b["img"].shape[0] for b in drop]
    assert sizes_d == [3, 3]


def test_synthetic_env_knob(tmp_path, monkeypatch):
    """OVMR_SYNTHETIC=classes,per_class,size scales the synthetic dataset
    (perf-soak knob; the registry instantiates datasets with cfg only)."""
    import ovmr_tpu.data.datasets  # noqa: F401  (populate the registry)
    from ovmr_tpu.data.registry import DATASET_REGISTRY
    from ovmr_tpu.utils.defaults import get_cfg_default

    monkeypatch.setenv("OVMR_SYNTHETIC", "5,6,32")
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 2
    ds = DATASET_REGISTRY.get("Synthetic")(cfg)
    assert ds.num_classes == 5
    assert len(ds.train_x) == 5 * 2  # NUM_SHOTS few-shot subset
