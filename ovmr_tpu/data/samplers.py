"""Batch samplers as deterministic numpy index generators.

Counterparts of the reference samplers (``dassl/data/samplers.py``). Exact
cross-framework RNG parity is impossible; these are seed-stable within this
framework and distributionally equivalent (verified by tests):

- RandomClassSampler: batches of ``ncls_per_batch x n_ins`` indices grouped
  by class; classes with fewer than n_ins items resample with replacement;
  no class dropped (tail batches may hold fewer classes).
- RandomFullClassSampler: N classes per batch with ALL their items.
- Sequential/Random samplers for plain iteration.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


class SequentialSampler:
    def __init__(self, data_source, **kwargs):
        self.n = len(data_source)

    def epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        return np.arange(self.n)


class RandomSampler:
    def __init__(self, data_source, **kwargs):
        self.n = len(data_source)

    def epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        return rng.permutation(self.n)


class RandomClassSampler:
    """N classes x K instances per batch (reference ``samplers.py:117-181``)."""

    def __init__(self, data_source, batch_size: int, n_ins: int, **kwargs):
        if batch_size < n_ins:
            raise ValueError(f"batch_size={batch_size} < n_ins={n_ins}")
        self.n_ins = n_ins
        self.ncls_per_batch = batch_size // n_ins
        self.index_by_label: Dict[int, List[int]] = defaultdict(list)
        for idx, item in enumerate(data_source):
            self.index_by_label[item.label].append(idx)
        self.labels = list(self.index_by_label)

    def epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        # chunk each class's (shuffled, resampled-if-short) indices into
        # groups of n_ins
        groups: Dict[int, List[np.ndarray]] = {}
        for label in self.labels:
            idxs = np.asarray(self.index_by_label[label])
            if len(idxs) < self.n_ins:
                idxs = rng.choice(idxs, size=self.n_ins, replace=True)
            idxs = rng.permutation(idxs)
            n_full = len(idxs) // self.n_ins
            groups[label] = [
                idxs[i * self.n_ins : (i + 1) * self.n_ins] for i in range(n_full)
            ]

        available = [l for l in self.labels if groups[l]]
        out: List[np.ndarray] = []
        while available:
            take = min(self.ncls_per_batch, len(available))
            chosen = rng.choice(len(available), size=take, replace=False)
            chosen_labels = [available[i] for i in chosen]
            for label in chosen_labels:
                out.append(groups[label].pop(0))
                if not groups[label]:
                    available.remove(label)
        return np.concatenate(out) if out else np.empty(0, np.int64)


class RandomFullClassSampler:
    """N classes per batch, all their items (reference ``samplers.py:184-246``)."""

    def __init__(self, data_source, batch_size: int, n_ins: int, **kwargs):
        self.n_ins = n_ins
        self.ncls_per_batch = max(batch_size // n_ins, 1)
        self.index_by_label: Dict[int, List[int]] = defaultdict(list)
        for idx, item in enumerate(data_source):
            self.index_by_label[item.label].append(idx)
        self.labels = list(self.index_by_label)

    def epoch_indices(self, rng: np.random.Generator) -> np.ndarray:
        per_label = {}
        for label in self.labels:
            idxs = np.asarray(self.index_by_label[label])
            if len(idxs) < self.n_ins:
                idxs = rng.choice(idxs, size=self.n_ins, replace=True)
            per_label[label] = rng.permutation(idxs)
        order = rng.permutation(len(self.labels))
        out = [per_label[self.labels[i]] for i in order]
        return np.concatenate(out) if out else np.empty(0, np.int64)


SAMPLERS = {
    "SequentialSampler": SequentialSampler,
    "RandomSampler": RandomSampler,
    "RandomClassSampler": RandomClassSampler,
    "RandomFullClassSampler": RandomFullClassSampler,
}


def build_sampler(name: str, data_source, batch_size: int, n_ins: int = 16):
    if name not in SAMPLERS:
        raise ValueError(f"unknown sampler {name!r}; available {sorted(SAMPLERS)}")
    return SAMPLERS[name](data_source, batch_size=batch_size, n_ins=n_ins)
