"""Decode-once uint8 image cache.

Training at TPU speed needs ~2000 img/s; PIL on this single-core host tops
out around 200. The cache decodes + geometry-normalizes every image ONCE
into a uint8 memmap (`[N, S, S, 3]`, smaller-edge resize + center crop at a
cache side larger than the train crop so random-resized-crop retains room),
and epochs after the first stream batches at memcpy speed into the
on-device augmentation program (:mod:`ovmr_tpu.ops.augment`).

No reference counterpart (the reference assumes a many-core host feeding
torch DataLoader workers).
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
from typing import Sequence

import numpy as np

from ovmr_tpu.utils.tools import mkdir_if_missing, read_image

from .transforms import center_crop, resize_smaller_edge


def _fingerprint(data_source, side: int) -> str:
    h = hashlib.sha1()
    h.update(str(side).encode())
    h.update(str(len(data_source)).encode())
    for item in data_source[:: max(1, len(data_source) // 64)]:
        h.update(item.impath.encode())
    return h.hexdigest()[:16]


class ImageArrayCache:
    """uint8 [N, side, side, 3] memmap over a Datum list."""

    def __init__(self, data_source: Sequence, side: int = 256, cache_dir: str = None):
        self.data_source = list(data_source)
        self.side = side
        cache_dir = cache_dir or os.environ.get(
            "OVMR_CACHE_DIR", "/tmp/ovmr_image_cache"
        )
        mkdir_if_missing(cache_dir)
        tag = _fingerprint(self.data_source, side)
        self.path = osp.join(cache_dir, f"imgs_{tag}.npy")
        self.labels = np.asarray([d.label for d in self.data_source], np.int32)
        if not osp.exists(self.path):
            self._build()
        self.images = np.load(self.path, mmap_mode="r")

    def _build(self) -> None:
        n, s = len(self.data_source), self.side
        print(f"Building image cache {self.path}: {n} images @ {s}x{s}")
        arr = np.lib.format.open_memmap(
            self.path + ".tmp.npy", mode="w+", dtype=np.uint8, shape=(n, s, s, 3)
        )
        for i, item in enumerate(self.data_source):
            img = read_image(item.impath)
            img = resize_smaller_edge(img, s)
            img = center_crop(img, (s, s))
            a = np.asarray(img, np.uint8)
            if a.ndim == 2:
                a = np.stack([a] * 3, -1)
            arr[i] = a
        arr.flush()
        del arr
        os.replace(self.path + ".tmp.npy", self.path)

    def batch(self, indices: np.ndarray) -> np.ndarray:
        return np.asarray(self.images[np.asarray(indices)])


class CachedClassBatchLoader:
    """Class-grouped uint8 batches from the cache (RandomClassSampler
    semantics), for the device-augmented training path."""

    def __init__(self, cache: ImageArrayCache, sampler, batch_size: int, seed: int = 0):
        self.cache = cache
        self.sampler = sampler
        self.batch_size = batch_size
        self._seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        rng = np.random.default_rng(self._seed)
        return len(self.sampler.epoch_indices(rng)) // self.batch_size

    def __iter__(self):
        rng = np.random.default_rng(self._seed + self._epoch)
        indices = self.sampler.epoch_indices(rng)
        self._epoch += 1
        for start in range(0, len(indices) - self.batch_size + 1, self.batch_size):
            sel = indices[start : start + self.batch_size]
            yield {
                "img_u8": self.cache.batch(sel),
                "label": self.cache.labels[sel],
                "index": sel,
            }
