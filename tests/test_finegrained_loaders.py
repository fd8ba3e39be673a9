"""Fine-grained loaders on synthetic raw-format trees: OxfordPets annotation
files, FGVCAircraft variant txts, OxfordFlowers .mat labels, StanfordCars
devkit .mat annotations."""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.utils.defaults import get_cfg_default


def cfg_for(root, shots=1):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.SEED = 1
    return cfg


def save_img(path, size=16):
    os.makedirs(osp.dirname(path), exist_ok=True)
    arr = (np.random.RandomState(0).rand(size, size, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def test_oxford_pets_annotations(tmp_path):
    from ovmr_tpu.data.datasets.fine_grained import OxfordPets

    base = tmp_path / "oxford_pets"
    names = []
    for breed_i, breed in enumerate(["abyssinian", "bengal"]):
        for i in range(5):
            imname = f"{breed.capitalize()}_{i}"
            save_img(str(base / "images" / f"{imname}.jpg"))
            names.append((imname, breed_i + 1))
    os.makedirs(base / "annotations", exist_ok=True)
    trainval = [f"{n} {l} 1 1" for n, l in names[:8]]
    test = [f"{n} {l} 1 1" for n, l in names[8:]]
    (base / "annotations" / "trainval.txt").write_text("\n".join(trainval))
    (base / "annotations" / "test.txt").write_text("\n".join(test))

    ds = OxfordPets(cfg_for(tmp_path))
    assert ds.num_classes == 2
    assert set(ds.classnames) == {"abyssinian", "bengal"}
    assert (base / "split_zhou_OxfordPets.json").exists()


def test_fgvc_aircraft_txt_splits(tmp_path):
    from ovmr_tpu.data.datasets.fine_grained import FGVCAircraft

    base = tmp_path / "fgvc_aircraft"
    os.makedirs(base, exist_ok=True)
    variants = ["707-320", "A300B4"]
    (base / "variants.txt").write_text("\n".join(variants))
    for split in ("train", "val", "test"):
        lines = []
        for i, v in enumerate(variants):
            imname = f"{split}{i}"
            save_img(str(base / "images" / f"{imname}.jpg"))
            lines.append(f"{imname} {v}")
        (base / f"images_variant_{split}.txt").write_text("\n".join(lines))

    ds = FGVCAircraft(cfg_for(tmp_path))
    assert ds.num_classes == 2
    assert ds.classnames == variants


def test_oxford_flowers_mat(tmp_path):
    from scipy.io import savemat

    from ovmr_tpu.data.datasets.fine_grained import OxfordFlowers

    base = tmp_path / "oxford_flowers"
    os.makedirs(base, exist_ok=True)
    labels = [1] * 6 + [2] * 6
    for i in range(len(labels)):
        save_img(str(base / "jpg" / f"image_{str(i + 1).zfill(5)}.jpg"))
    savemat(str(base / "imagelabels.mat"), {"labels": np.asarray([labels])})
    (base / "cat_to_name.json").write_text(
        json.dumps({"1": "pink primrose", "2": "hard-leaved pocket orchid"})
    )

    ds = OxfordFlowers(cfg_for(tmp_path))
    assert ds.num_classes == 2
    assert set(ds.classnames) == {"pink primrose", "hard-leaved pocket orchid"}


def test_stanford_cars_mat(tmp_path):
    from scipy.io import savemat

    from ovmr_tpu.data.datasets.fine_grained import StanfordCars

    base = tmp_path / "stanford_cars"
    os.makedirs(base / "devkit", exist_ok=True)

    def annos(split, n=6):
        rows = []
        for i in range(n):
            fname = f"{split}_{i}.jpg"
            save_img(str(base / f"cars_{split}" / fname))
            rows.append((fname, (i % 2) + 1))
        dtype = [("fname", "O"), ("class", "O")]
        arr = np.zeros((1, n), dtype=dtype)
        for i, (fname, cls) in enumerate(rows):
            arr[0, i]["fname"] = np.asarray([fname])
            arr[0, i]["class"] = np.asarray([[cls]])
        return arr

    meta = np.zeros((1, 2), dtype=[("n", "O")])
    names = np.empty((1, 2), dtype=object)
    names[0, 0] = np.asarray(["AM General Hummer SUV 2000"])
    names[0, 1] = np.asarray(["Acura RL Sedan 2012"])
    savemat(str(base / "devkit" / "cars_train_annos.mat"), {"annotations": annos("train")})
    savemat(str(base / "cars_test_annos_withlabels.mat"), {"annotations": annos("test")})
    savemat(str(base / "devkit" / "cars_meta.mat"), {"class_names": names})

    ds = StanfordCars(cfg_for(tmp_path))
    assert ds.num_classes == 2
    # year moves to the front of the classname (reference munging)
    assert "2000 AM General Hummer SUV" in ds.classnames
