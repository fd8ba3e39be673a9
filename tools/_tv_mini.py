"""Faithful minimal torchvision stand-in for reference-harness goldens.

torchvision is not installed in this image; ``_reference_harness.install``
registers an INERT ``torchvision`` so reference modules merely import.
The full-loop e2e golden (tools/gen_e2e_golden.py) goes further: it runs
the REAL Dassl data pipeline (``dassl/data/data_manager.py`` +
``dassl/data/transforms/transforms.py``) end to end, so the transform
operators on the deterministic chain must actually work. ``install_tv_mini``
replaces the inert modules with PIL-backed implementations that match
torchvision's documented PIL semantics exactly:

- ``Resize(int)``: smaller edge to ``size``; the long edge uses int()
  TRUNCATION (torchvision ``_compute_resized_output_size``), mirroring
  ``ovmr_tpu/data/transforms.py::resize_smaller_edge``.
- ``Resize((h, w))``: exact resize (the ``DatasetWrapper.to_tensor`` chain,
  reference ``data_manager.py:289``).
- ``CenterCrop``: ``int(round((H - th) / 2.0))`` offsets.
- ``ToTensor``: HWC uint8 -> CHW float32 / 255.
- ``Normalize``: ``(t - mean) / std`` channelwise, fp32.

Every STOCHASTIC transform (RandomCrop, ColorJitter, ...) is constructible
— the reference builds some eagerly (``data_manager.py:59-62``) — but
raises on use, so a golden can never silently depend on an operator this
file does not model faithfully.
"""

import sys
import types

import numpy as np
from PIL import Image


class InterpolationMode:
    NEAREST = Image.NEAREST
    BILINEAR = Image.BILINEAR
    BICUBIC = Image.BICUBIC
    LANCZOS = Image.LANCZOS
    BOX = Image.BOX
    HAMMING = Image.HAMMING


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def __repr__(self):
        return "ComposeMini(%s)" % (self.transforms,)


class Resize:
    def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                 **kwargs):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        if not isinstance(img, Image.Image):
            raise NotImplementedError("tv-mini Resize handles PIL only")
        if isinstance(self.size, int):
            w, h = img.size
            short, long = (w, h) if w <= h else (h, w)
            if short == self.size:
                return img
            new_short = self.size
            new_long = int(self.size * long / short)  # torchvision truncates
            nw, nh = (
                (new_short, new_long) if w <= h else (new_long, new_short)
            )
            return img.resize((nw, nh), self.interpolation)
        h, w = self.size
        return img.resize((w, h), self.interpolation)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        if not isinstance(img, Image.Image):
            raise NotImplementedError("tv-mini CenterCrop handles PIL only")
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:
            raise NotImplementedError(
                "tv-mini CenterCrop does not model the pad-small branch"
            )
        top = int(round((h - th) / 2.0))
        left = int(round((w - tw) / 2.0))
        return img.crop((left, top, left + tw, top + th))


class ToTensor:
    def __call__(self, img):
        import torch

        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        chw = np.ascontiguousarray(arr.transpose(2, 0, 1))
        return torch.from_numpy(chw).float().div(255.0)


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = mean
        self.std = std

    def __call__(self, t):
        import torch

        mean = torch.as_tensor(self.mean, dtype=t.dtype).view(-1, 1, 1)
        std = torch.as_tensor(self.std, dtype=t.dtype).view(-1, 1, 1)
        return (t - mean) / std


def _raise_on_use(name):
    class _Unfaithful:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError(
                f"tv-mini: {name} is constructible but has no faithful "
                f"implementation; the golden chain must not reach it"
            )

    _Unfaithful.__name__ = name
    return _Unfaithful


_STOCHASTIC = [
    "RandomCrop", "ColorJitter", "RandomApply", "GaussianBlur",
    "RandomGrayscale", "RandomResizedCrop", "RandomHorizontalFlip",
    "AugMix", "RandomRotation", "RandomVerticalFlip", "Pad",
]


def _raise_fn(name):
    def fn(*a, **k):
        raise NotImplementedError(f"tv-mini functional.{name} unmodelled")

    fn.__name__ = name
    return fn


def install_tv_mini():
    """Replace the harness's inert torchvision with the faithful mini.

    Call AFTER ``_reference_harness.install()`` and BEFORE importing any
    ``dassl.data`` module (they bind the names at import time).
    """
    for m in ("dassl.data", "dassl.data.transforms",
              "dassl.data.transforms.transforms", "dassl.data.data_manager"):
        if m in sys.modules:
            raise RuntimeError(f"install_tv_mini must run before {m} import")

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")

    for cls in (Compose, Resize, CenterCrop, ToTensor, Normalize):
        setattr(tr, cls.__name__, cls)
    for name in _STOCHASTIC:
        setattr(tr, name, _raise_on_use(name))
    tr.InterpolationMode = InterpolationMode
    tr.functional = fn

    fn.InterpolationMode = InterpolationMode
    for name in ("resize", "pad", "crop", "center_crop", "to_tensor",
                 "hflip", "vflip", "normalize", "rotate"):
        setattr(fn, name, _raise_fn(name))

    tv.transforms = tr
    tv.__version__ = "0.0-mini"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn
    return tv
