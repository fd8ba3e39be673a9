"""DA/DG/SSL dataset loaders (SURVEY D22) against tiny on-disk trees in the
reference's exact layouts. Loaders only list paths at construction, so the
trees use empty files."""

import os
import os.path as osp
import pickle

import pytest

from ovmr_tpu.data.datum import Datum
from ovmr_tpu.data.registry import build_dataset
from ovmr_tpu.utils.defaults import get_cfg_default


def make_cfg(root, name, source=(), target=(), **dataset_overrides):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = name
    cfg.DATASET.SOURCE_DOMAINS = tuple(source)
    cfg.DATASET.TARGET_DOMAINS = tuple(target)
    for k, v in dataset_overrides.items():
        setattr(cfg.DATASET, k, v)
    cfg.SEED = 1
    return cfg


def touch(*path):
    p = osp.join(*path)
    os.makedirs(osp.dirname(p), exist_ok=True)
    open(p, "w").close()
    return p


# --------------------------------------------------------------------------
# DA
# --------------------------------------------------------------------------

def make_digit5(root, domains=("mnist", "usps"), n=4):
    for dname in domains:
        for split_dir in ("train_images", "test_images"):
            for i in range(n):
                touch(root, "digit5", dname, split_dir, f"im{i}_{i % 3}.png")


def test_digit5_domains_and_usps_repeat(tmp_path):
    make_digit5(tmp_path, n=4)
    cfg = make_cfg(tmp_path, "Digit5", source=["mnist"], target=["usps"])
    ds = build_dataset(cfg)
    # labels parsed from <name>_<label> filenames
    assert sorted({d.label for d in ds.train_x}) == [0, 1, 2]
    assert all(d.domain == 0 for d in ds.train_x)
    # usps train repeats 3x (reference da/digit5.py:58-60)
    assert len(ds.train_u) == 4 * 3
    assert len(ds.test) == 4
    assert ds.train_x[0].classname == str(ds.train_x[0].label)


def test_digit5_rejects_unknown_domain(tmp_path):
    make_digit5(tmp_path)
    cfg = make_cfg(tmp_path, "Digit5", source=["mnist"], target=["nope"])
    with pytest.raises(ValueError, match="nope"):
        build_dataset(cfg)


def test_visda17(tmp_path):
    for filedir, n in (("train", 3), ("validation", 2)):
        lines = []
        for i in range(n):
            rel = f"class{i}/im{i}.jpg"
            touch(tmp_path, "visda17", filedir, rel)
            lines.append(f"{rel} {i}")
        with open(touch(tmp_path, "visda17", filedir, "image_list.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    cfg = make_cfg(tmp_path, "VisDA17", source=["synthetic"], target=["real"])
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 3 and len(ds.train_u) == 2 and len(ds.test) == 2
    assert ds.train_x[1].classname == "class1"
    assert ds.train_x[1].impath.endswith("train/class1/im1.jpg")
    assert all(d.domain == 0 for d in ds.train_x)


def test_cifarstl_label_from_folder_prefix(tmp_path):
    for dname in ("cifar", "stl"):
        for split in ("train", "test"):
            for label, cname in ((0, "0_airplane"), (3, "3_cat")):
                for i in range(2):
                    touch(tmp_path, "cifar_stl", dname, split, cname,
                          f"im{i}.png")
    cfg = make_cfg(tmp_path, "CIFARSTL", source=["cifar"], target=["stl"])
    ds = build_dataset(cfg)
    assert sorted({d.label for d in ds.train_x}) == [0, 3]
    assert len(ds.train_x) == 4 and len(ds.test) == 4


def test_office31_and_officehome_folder_trees(tmp_path):
    classes = ["Bike", "Monitor"]
    for dsdir, domains in (("office31", ("amazon", "dslr")),
                           ("office_home", ("art", "product"))):
        for dname in domains:
            for cname in classes:
                for i in range(2):
                    touch(tmp_path, dsdir, dname, cname, f"im{i}.jpg")

    ds = build_dataset(
        make_cfg(tmp_path, "Office31", source=["amazon"], target=["dslr"])
    )
    # labels by sorted folder order; classnames NOT lowercased
    assert ds.train_x[0].classname in classes
    assert ds.num_classes == 2
    assert len(ds.train_u) == len(ds.test) == 4

    ds = build_dataset(
        make_cfg(tmp_path, "OfficeHome", source=["art"], target=["product"])
    )
    # OfficeHome lowercases classnames (reference da/office_home.py:60)
    assert {d.classname for d in ds.train_x} == {"bike", "monitor"}


def make_domainnet(root, split_dirname, domains, n=3):
    for dname in domains:
        for split in ("train", "test"):
            lines = []
            for i in range(n):
                rel = f"{dname}/class{i}/im{i}.jpg"
                touch(root, "domainnet", rel)
                lines.append(f"{rel} {i}")
            with open(
                touch(root, "domainnet", split_dirname, f"{dname}_{split}.txt"),
                "w",
            ) as f:
                f.write("\n".join(lines) + "\n")


def test_domainnet_and_mini(tmp_path):
    make_domainnet(tmp_path, "splits", ("clipart", "sketch"))
    ds = build_dataset(
        make_cfg(tmp_path, "DomainNet", source=["clipart"], target=["sketch"])
    )
    # val = source test files (reference da/domainnet.py:42)
    assert len(ds.val) == 3
    assert ds.train_x[2].classname == "class2"

    make_domainnet(tmp_path, "splits_mini", ("painting", "real"))
    ds = build_dataset(
        make_cfg(tmp_path, "miniDomainNet", source=["painting"],
                 target=["real"])
    )
    assert len(ds.val) == 0 and len(ds.train_x) == 3


# --------------------------------------------------------------------------
# DG
# --------------------------------------------------------------------------

def make_pacs(root, domains=("photo", "sketch"), n=3):
    for dname in domains:
        for split in ("train", "crossval"):
            lines = []
            for i in range(n):
                rel = f"{dname}/dog/im_{split}_{i}.png"
                touch(root, "pacs", "images", rel)
                lines.append(f"{rel} {i + 1}")  # kfold labels are 1-based
            if dname == "sketch" and split == "train":
                # the known-corrupt path must be skipped
                lines.append("sketch/dog/n02103406_4068-1.png 1")
            with open(
                touch(root, "pacs", "splits", f"{dname}_{split}_kfold.txt"),
                "w",
            ) as f:
                f.write("\n".join(lines) + "\n")


def test_pacs_kfold_labels_error_path_and_all(tmp_path):
    make_pacs(tmp_path)
    cfg = make_cfg(tmp_path, "PACS", source=["photo"], target=["sketch"])
    ds = build_dataset(cfg)
    # 1-based labels shifted down
    assert sorted({d.label for d in ds.train_x}) == [0, 1, 2]
    assert len(ds.val) == 3
    # target "all" = train+crossval, corrupt sketch image skipped
    assert len(ds.test) == 6
    assert not any("n02103406_4068-1" in d.impath for d in ds.test)
    assert ds.train_x[0].classname == "dog"


def test_vlcs_upper_dirs(tmp_path):
    for dname in ("CALTECH", "SUN"):
        for split in ("train", "crossval", "test"):
            for cname in ("bird", "car"):
                for i in range(2):
                    touch(tmp_path, "VLCS", dname, split, cname, f"im{i}.jpg")
    cfg = make_cfg(tmp_path, "VLCS", source=["caltech"], target=["sun"])
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 4 and len(ds.val) == 4 and len(ds.test) == 4
    assert sorted({d.label for d in ds.train_x}) == [0, 1]


def make_digits_dg(root, dsdir, domains, n=2):
    for dname in domains:
        for split in ("train", "val"):
            for cname in ("Alpha", "Beta"):
                for i in range(n):
                    touch(root, dsdir, dname, split, cname, f"im{i}.jpg")


def test_digits_dg_and_office_home_dg(tmp_path):
    make_digits_dg(tmp_path, "digits_dg", ("mnist", "syn"))
    ds = build_dataset(
        make_cfg(tmp_path, "DigitsDG", source=["mnist"], target=["syn"])
    )
    assert len(ds.train_x) == 4 and len(ds.val) == 4
    assert len(ds.test) == 8  # target "all" = train+val
    assert {d.classname for d in ds.train_x} == {"alpha", "beta"}

    make_digits_dg(tmp_path, "office_home_dg", ("art", "clipart"))
    ds = build_dataset(
        make_cfg(tmp_path, "OfficeHomeDG", source=["art"], target=["clipart"])
    )
    assert len(ds.train_x) == 4 and len(ds.test) == 8


def test_digit_single_deterministic_no_repeat(tmp_path):
    make_digit5(tmp_path, domains=("mnist", "usps"), n=5)
    cfg = make_cfg(tmp_path, "DigitSingle", source=["usps"], target=["mnist"])
    ds = build_dataset(cfg)
    # DG protocol: no usps x3 repeat, val = source test split
    assert len(ds.train_x) == 5 and len(ds.val) == 5 and len(ds.test) == 5
    # deterministic (truncation, not sampling): same order on re-load
    ds2 = build_dataset(cfg)
    assert [d.impath for d in ds2.train_x] == [d.impath for d in ds.train_x]


def test_cifar10c_layout_and_validation(tmp_path):
    for cname in ("airplane", "cat"):
        for i in range(2):
            touch(tmp_path, "cifar10", "train", cname, f"im{i}.png")
            touch(tmp_path, "cifar10_c", "fog", "3", cname, f"im{i}.png")
    cfg = make_cfg(
        tmp_path, "CIFAR10C", source=["cifar10"], target=["cifar10_c"],
        CIFAR_C_TYPE="fog", CIFAR_C_LEVEL=3,
    )
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 4 and len(ds.test) == 4

    cfg.DATASET.CIFAR_C_TYPE = ""
    with pytest.raises(ValueError, match="CIFAR_C_TYPE"):
        build_dataset(cfg)
    cfg.DATASET.CIFAR_C_TYPE = "not_a_corruption"
    with pytest.raises(ValueError, match="C_TYPE"):
        build_dataset(cfg)
    cfg.DATASET.CIFAR_C_TYPE = "fog"
    cfg.DATASET.CIFAR_C_LEVEL = 9
    with pytest.raises(ValueError, match="CIFAR_C_LEVEL"):
        build_dataset(cfg)
    # fixed source/target order enforced (reference dg/cifar_c.py:59-61)
    cfg.DATASET.CIFAR_C_LEVEL = 3
    cfg.DATASET.SOURCE_DOMAINS = ("cifar10_c",)
    with pytest.raises(ValueError):
        build_dataset(cfg)


# --------------------------------------------------------------------------
# WILDS (preloaded-pkl contract; the wilds package is not installed here)
# --------------------------------------------------------------------------

def make_wilds_preloaded(root, dsdir, n_domains=3, per_domain=4):
    items = {"train": [], "val": [], "test": []}
    label_names = {0: "healthy tissue", 1: "tumor tissue"}
    for split, k in (("train", per_domain), ("val", 2), ("test", 2)):
        for dom in range(n_domains):
            for i in range(k):
                label = i % 2
                items[split].append(
                    Datum(
                        impath=osp.join(str(root), dsdir, f"{split}_{dom}_{i}.png"),
                        label=label,
                        domain=dom,
                        classname=label_names[label],
                    )
                )
    os.makedirs(osp.join(str(root), dsdir), exist_ok=True)
    with open(osp.join(str(root), dsdir, "zhou_preloaded.pkl"), "wb") as f:
        pickle.dump(items, f)
    return items


def test_camelyon17_preloaded_and_fewshot(tmp_path):
    items = make_wilds_preloaded(tmp_path, "camelyon17_v1.0")
    cfg = make_cfg(tmp_path, "Camelyon17", NUM_SHOTS=-1)
    ds = build_dataset(cfg)
    assert len(ds.train_x) == len(items["train"])
    assert ds.classnames == ["healthy tissue", "tumor tissue"]

    # few-shot samples per class PER DOMAIN (reference wilds_base.py:50-59)
    cfg = make_cfg(tmp_path, "Camelyon17", NUM_SHOTS=1)
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 3 * 2  # 3 domains x 2 classes x 1 shot


def test_camelyon17_missing_pkl_raises_informative(tmp_path):
    os.makedirs(tmp_path / "camelyon17_v1.0", exist_ok=True)
    cfg = make_cfg(tmp_path, "Camelyon17")
    with pytest.raises(FileNotFoundError, match="zhou_preloaded"):
        build_dataset(cfg)


def test_fmow_classnames():
    from ovmr_tpu.data.datasets.dg import FMOW_CATEGORIES, FMoW

    names = FMoW.load_classnames(FMoW.__new__(FMoW))
    assert len(names) == 62 and names[0] == "airport" and names[61] == "zoo"
    assert FMOW_CATEGORIES[30] == "multi-unit_residential"


def test_iwildcam_classnames_csv(tmp_path):
    from ovmr_tpu.data.datasets.dg import IWildCam

    obj = IWildCam.__new__(IWildCam)
    obj.dataset_dir = str(tmp_path)
    with open(tmp_path / "categories.csv", "w") as f:
        f.write("category_id,name\n7,empty\n24,deer\n")
    assert obj.load_classnames() == {0: "empty", 1: "deer"}


# --------------------------------------------------------------------------
# SSL
# --------------------------------------------------------------------------

def make_ssl_folder(root, dsdir, n_classes=2, per_class=10):
    for split in ("train", "test"):
        for c in range(n_classes):
            for i in range(per_class):
                touch(root, dsdir, split, f"class{c}", f"im{i:02d}.png")


def test_ssl_cifar10_labeled_split(tmp_path):
    make_ssl_folder(tmp_path, "cifar10")
    cfg = make_cfg(tmp_path, "CIFAR10", NUM_LABELED=4, VAL_PERCENT=0.2)
    ds = build_dataset(cfg)
    # per class: 2 val (floor(10*0.2)), 2 labeled (4/2), 6 unlabeled
    assert len(ds.val) == 4
    assert len(ds.train_x) == 4
    assert len(ds.train_u) == 12
    assert len(ds.test) == 20

    cfg.DATASET.ALL_AS_UNLABELED = True
    ds = build_dataset(cfg)
    assert len(ds.train_u) == 16

    cfg.DATASET.NUM_LABELED = -1
    with pytest.raises(ValueError, match="NUM_LABELED"):
        build_dataset(cfg)


def test_ssl_svhn_and_cifar100_are_layout_aliases(tmp_path):
    make_ssl_folder(tmp_path, "svhn")
    make_ssl_folder(tmp_path, "cifar100")
    for name in ("SVHN", "CIFAR100"):
        ds = build_dataset(make_cfg(tmp_path, name, NUM_LABELED=2))
        assert len(ds.train_x) == 2 and ds.num_classes == 2


def test_stl10_folds_and_unlabeled(tmp_path):
    for i in range(6):
        touch(tmp_path, "stl10", "train", f"im{i:03d}_{i % 2}.png")
        touch(tmp_path, "stl10", "test", f"im{i:03d}_{i % 2}.png")
    for i in range(4):
        touch(tmp_path, "stl10", "unlabeled", f"im{i:03d}_none.png")
    with open(
        touch(tmp_path, "stl10", "stl10_binary", "fold_indices.txt"), "w"
    ) as f:
        f.write("0 2 4\n1 3 5\n")

    cfg = make_cfg(tmp_path, "STL10", STL10_FOLD=1)
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 3
    assert all(d.label == 1 for d in ds.train_x)  # odd indices -> label 1
    assert len(ds.train_u) == 4
    assert all(d.label == -1 for d in ds.train_u)  # "none" -> -1
    assert len(ds.test) == 6

    cfg.DATASET.STL10_FOLD = -1  # all training images
    ds = build_dataset(cfg)
    assert len(ds.train_x) == 6

    cfg.DATASET.STL10_FOLD = 7
    with pytest.raises(ValueError, match="STL10_FOLD"):
        build_dataset(cfg)


# --------------------------------------------------------------------------
# integration: a real DA trainer driven by a real D22 loader
# --------------------------------------------------------------------------

def test_source_only_trains_on_digit5(tmp_path):
    """The new DA loaders plug into the DataManager + trainer stack: build
    a real digit5 tree (actual PNGs), train SourceOnly for one epoch."""
    import numpy as np
    from PIL import Image

    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()

    rng = np.random.RandomState(0)
    for dname in ("mnist", "usps"):
        for split_dir in ("train_images", "test_images"):
            d = tmp_path / "digit5" / dname / split_dir
            d.mkdir(parents=True, exist_ok=True)
            for i in range(8):
                arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"im{i}_{i % 4}.png")

    cfg = get_cfg_default()
    cfg.TRAINER.NAME = "SourceOnly"
    cfg.DATASET.NAME = "Digit5"
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.SOURCE_DOMAINS = ("mnist",)
    cfg.DATASET.TARGET_DOMAINS = ("usps",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.MODEL.BACKBONE.NAME = "cnn_digit5_m3sda"
    cfg.MODEL.BACKBONE.PRETRAINED = False
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.01
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TEST.NO_TEST = False
    cfg.freeze()

    trainer = build_trainer(cfg)
    trainer.train()
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "model", "checkpoint"))
