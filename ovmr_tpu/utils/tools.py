"""Misc utilities: seeding, filesystem helpers, image reading.

Counterparts of ``dassl/utils/tools.py`` (set_random_seed / read_image /
listdir_nohidden / mkdir_if_missing), JAX-flavored: seeding covers python,
numpy and returns a ``jax.random.PRNGKey``.
"""

from __future__ import annotations

import errno
import os
import os.path as osp
import random
from typing import List

import numpy as np


def set_random_seed(seed: int):
    """Seed python + numpy and return a jax PRNGKey for device-side rng."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


def mkdir_if_missing(dirname: str) -> None:
    if not osp.exists(dirname):
        try:
            os.makedirs(dirname)
        except OSError as e:  # pragma: no cover - race with other process
            if e.errno != errno.EEXIST:
                raise


def check_isfile(fpath: str) -> bool:
    """True iff `fpath` is an existing file; warns when a non-empty path
    is not (reference ``dassl/utils/tools.py::check_isfile``)."""
    isfile = osp.isfile(fpath)
    if not isfile and fpath:
        print(f'No file found at "{fpath}"')
    return isfile


def listdir_nohidden(path: str, sort: bool = False) -> List[str]:
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    if sort:
        items.sort()
    return items


def read_image(path: str):
    """Read an image as PIL RGB, retrying on transient filesystem errors
    (reference keeps retrying forever, ``dassl/utils/tools.py:113-122``;
    we cap at a few attempts and surface the error)."""
    from PIL import Image

    if not osp.exists(path):
        raise IOError(f"No file exists at {path}")

    last_err = None
    for _ in range(3):
        try:
            return Image.open(path).convert("RGB")
        except Exception as e:  # pragma: no cover - IO flake
            last_err = e
    raise IOError(f"Cannot read image from {path}: {last_err}")


def collect_env_info() -> str:
    import jax
    import platform

    lines = [
        f"python: {platform.python_version()}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
    ]
    return "\n".join(lines)
