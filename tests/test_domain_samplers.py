"""Domain samplers + TEXT_ONLY / RETURN_IMG0 loader paths
(reference ``dassl/data/samplers.py:12-114``, ``data_manager.py:279-331``)."""

import numpy as np
import pytest

from ovmr_tpu.data import Datum, build_sampler
from ovmr_tpu.data.manager import HostDataLoader


def make_domain_items(domains=(0, 1, 2), per_domain=8):
    return [
        Datum(
            impath=f"/x/d{d}_{i}.jpg",
            label=i % 2,
            classname=f"class{i % 2}",
            domain=d,
        )
        for d in domains
        for i in range(per_domain)
    ]


def test_random_domain_sampler_batches():
    items = make_domain_items((0, 1, 2), 8)
    sampler = build_sampler(
        "RandomDomainSampler", items, batch_size=4, n_domain=2
    )
    idx = sampler.epoch_indices(np.random.default_rng(0))
    domains = np.asarray([items[i].domain for i in idx])
    # every group of 2 comes from one domain
    for start in range(0, len(idx) - 1, 2):
        assert domains[start] == domains[start + 1]
    # no index repeats within the epoch
    assert len(set(idx.tolist())) == len(idx)


def test_random_domain_sampler_all_domains_default():
    items = make_domain_items((0, 1, 2), 6)
    sampler = build_sampler("RandomDomainSampler", items, batch_size=6, n_domain=0)
    assert sampler.n_domain == 3
    idx = sampler.epoch_indices(np.random.default_rng(1))
    domains = np.asarray([items[i].domain for i in idx])
    # each round of 6 holds 2 from each of the 3 domains
    for start in range(0, len(idx) - 5, 6):
        vals, counts = np.unique(domains[start : start + 6], return_counts=True)
        assert sorted(vals.tolist()) == [0, 1, 2]
        assert (counts == 2).all()


def test_random_domain_sampler_rejects_indivisible():
    items = make_domain_items((0, 1), 4)
    with pytest.raises(ValueError):
        build_sampler("RandomDomainSampler", items, batch_size=5, n_domain=2)


def test_seq_domain_sampler_round_robin():
    items = make_domain_items((2, 0, 1), 6)
    sampler = build_sampler("SeqDomainSampler", items, batch_size=6)
    idx = sampler.epoch_indices(np.random.default_rng(2))
    domains = np.asarray([items[i].domain for i in idx])
    # fixed sorted domain order 0,1,2 with 2 images each per round
    for start in range(0, len(idx) - 5, 6):
        assert domains[start : start + 6].tolist() == [0, 0, 1, 1, 2, 2]
    assert len(set(idx.tolist())) == len(idx)


def test_text_only_loader_skips_image_io(tmp_path):
    # impaths don't exist: TEXT_ONLY must never read them
    items = [
        Datum(impath=f"/nonexistent/{i}.jpg", label=i % 3, classname=f"c{i % 3}")
        for i in range(10)
    ]
    loader = HostDataLoader(
        items,
        build_sampler("SequentialSampler", items, 4),
        transform=None,
        batch_size=4,
        text_only=True,
    )
    batches = list(loader)
    assert len(batches) == 3
    assert "img" not in batches[0]
    assert batches[0]["label"].tolist() == [0, 1, 2, 0]
    assert len(batches[0]["impath"]) == 4


def test_return_img0(tmp_path):
    from PIL import Image

    from ovmr_tpu.data.transforms import build_transform, to_tensor_transform
    from ovmr_tpu.utils.defaults import get_cfg_default

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = tmp_path / f"{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    items = [Datum(impath=p, label=0, classname="c") for p in paths]

    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
    loader = HostDataLoader(
        items,
        build_sampler("SequentialSampler", items, 4),
        transform=build_transform(cfg, is_train=True),
        batch_size=4,
        return_img0=True,
        img0_transform=to_tensor_transform(cfg),
    )
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 3, 32, 32)
    assert batch["img0"].shape == (4, 3, 32, 32)
    # img0 is deterministic (no augmentation): re-iterating reproduces it
    batch2 = next(iter(loader))
    np.testing.assert_allclose(batch["img0"], batch2["img0"])
