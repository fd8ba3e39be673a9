"""Dataset registry (reference ``dassl/data/datasets/build.py``)."""

from __future__ import annotations

from ovmr_tpu.utils.registry import Registry

DATASET_REGISTRY = Registry("DATASET")


def build_dataset(cfg):
    name = cfg.DATASET.NAME
    # importing the package registers all bundled loaders
    from ovmr_tpu.data import datasets as _  # noqa: F401

    return DATASET_REGISTRY.get(name)(cfg)
