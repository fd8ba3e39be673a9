"""Dataset loader machinery against real on-disk formats: folder-tree split
construction, split_zhou json roundtrip, few-shot cache reuse, base/new."""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.utils.defaults import get_cfg_default


def make_folder_dataset(root, n_classes=4, per_class=10, size=24):
    image_dir = osp.join(root, "dtd", "images")
    rng = np.random.RandomState(0)
    for c in range(n_classes):
        cdir = osp.join(image_dir, f"texture{c}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(osp.join(cdir, f"im{i}.jpg"))
    return image_dir


def make_cfg(root, shots=2, subsample="all"):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = "DescribableTextures"
    cfg.DATASET.NUM_SHOTS = shots
    cfg.DATASET.SUBSAMPLE_CLASSES = subsample
    cfg.SEED = 1
    return cfg


def test_folder_split_json_and_fewshot_cache(tmp_path):
    from ovmr_tpu.data.datasets.fine_grained import DescribableTextures

    make_folder_dataset(tmp_path)
    ds = DescribableTextures(make_cfg(tmp_path))

    split_path = tmp_path / "dtd" / "split_zhou_DescribableTextures.json"
    assert split_path.exists()
    split = json.loads(split_path.read_text())
    assert set(split) == {"train", "val", "test"}
    # impaths stored relative to image_dir
    assert not split["train"][0][0].startswith("/")

    # few-shot: 2 shots per class
    counts = {}
    for d in ds.train_x:
        counts[d.label] = counts.get(d.label, 0) + 1
    assert all(v == 2 for v in counts.values())
    cache = tmp_path / "dtd" / "split_fewshot" / "shot_2-seed_1.pkl"
    assert cache.exists()

    # second load reuses json + pickle (and produces identical few-shot sets)
    ds2 = DescribableTextures(make_cfg(tmp_path))
    assert [d.impath for d in ds2.train_x] == [d.impath for d in ds.train_x]

    # 50/20/30 split proportions per class
    train_all = split["train"]
    assert len(train_all) == 4 * 5
    assert len(split["val"]) == 4 * 2
    assert len(split["test"]) == 4 * 3


def test_base_new_subsample_via_loader(tmp_path):
    from ovmr_tpu.data.datasets.fine_grained import DescribableTextures

    make_folder_dataset(tmp_path)
    base = DescribableTextures(make_cfg(tmp_path, subsample="base"))
    new = DescribableTextures(make_cfg(tmp_path, subsample="new"))
    assert base.num_classes == 2 and new.num_classes == 2
    assert {d.classname for d in base.test} == {"texture0", "texture1"}
    assert {d.classname for d in new.test} == {"texture2", "texture3"}
    # relabeled from 0
    assert sorted({d.label for d in new.test}) == [0, 1]


def test_reference_split_json_loads(tmp_path):
    """A split json written in the reference's exact format loads as-is."""
    from ovmr_tpu.data.datasets.fine_grained import EuroSAT

    image_dir = tmp_path / "eurosat" / "2750"
    os.makedirs(image_dir / "Forest", exist_ok=True)
    arr = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    for i in range(4):
        Image.fromarray(arr).save(image_dir / "Forest" / f"f{i}.jpg")
    split = {
        "train": [[f"Forest/f0.jpg", 0, "Forest"], [f"Forest/f1.jpg", 0, "Forest"]],
        "val": [[f"Forest/f2.jpg", 0, "Forest"]],
        "test": [[f"Forest/f3.jpg", 0, "Forest"]],
    }
    (tmp_path / "eurosat" / "split_zhou_EuroSAT.json").write_text(json.dumps(split))

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "EuroSAT"
    cfg.DATASET.NUM_SHOTS = 1
    cfg.SEED = 1
    ds = EuroSAT(cfg)
    assert len(ds.test) == 1
    assert ds.test[0].impath.endswith("Forest/f3.jpg")
    assert osp.exists(ds.test[0].impath)


def test_generate_fewshot_dataset_eval():
    """Disjoint eval-shot sampling (reference datasets/imagenet.py:63-128,
    dead + crash-buggy there): is_seen=True draws shots whose impath never
    overlaps the existing train shots, deterministically per seed; thin
    classes and a missing exist set raise; is_seen=False is the plain
    subsample."""
    from ovmr_tpu.data.datum import Datum, generate_fewshot_dataset_eval

    def make(label, n):
        return [
            Datum(impath=f"/img/{label}_{i}.jpg", label=label,
                  classname=f"c{label}")
            for i in range(n)
        ]

    pool = make(0, 8) + make(1, 8)
    train_shots = [pool[0], pool[1], pool[8], pool[9]]  # 2 shots per class

    out = generate_fewshot_dataset_eval(
        pool, num_shots=2, is_seen=True, seed=3,
        exist_few_shot_train=train_shots,
    )
    assert len(out) == 4
    train_paths = {d.impath for d in train_shots}
    assert not train_paths & {d.impath for d in out}
    for label in (0, 1):
        assert sum(d.label == label for d in out) == 2
    # deterministic per seed
    out2 = generate_fewshot_dataset_eval(
        pool, num_shots=2, is_seen=True, seed=3,
        exist_few_shot_train=train_shots,
    )
    assert [d.impath for d in out] == [d.impath for d in out2]

    # unseen classes: plain subsample, no exist set needed
    unseen = generate_fewshot_dataset_eval(
        make(2, 3), num_shots=2, is_seen=False, seed=1
    )
    assert len(unseen) == 2

    # passthrough and error paths
    assert generate_fewshot_dataset_eval(pool, num_shots=-1) is pool
    with pytest.raises(ValueError, match="2\\*num_shots"):
        generate_fewshot_dataset_eval(
            make(0, 3), num_shots=2, is_seen=True,
            exist_few_shot_train=train_shots,
        )
    with pytest.raises(ValueError, match="exist_few_shot_train"):
        generate_fewshot_dataset_eval(pool, num_shots=2, is_seen=True)
