"""Shared test utilities."""

import numpy as np


class FakeTensor:
    """numpy-backed stand-in so import_torch converters can consume recorded
    state_dicts without torch."""

    def __init__(self, a):
        self.a = np.asarray(a)

    @property
    def shape(self):
        return self.a.shape

    def detach(self):
        return self

    def cpu(self):
        return self

    def float(self):
        return FakeTensor(self.a.astype(np.float32))

    def numpy(self):
        return self.a


def npz_state_dict(data, prefix):
    """Extract {key: FakeTensor} entries with `prefix.` stripped."""
    plen = len(prefix) + 1
    return {
        k[plen:]: FakeTensor(data[k]) for k in data.files if k.startswith(prefix + ".")
    }
