"""CPU stub harness for running REFERENCE modules (study-only ground truth).

The reference (/root/reference, read-only) hard-codes ``.cuda()`` calls and
fp16 casts and imports packages absent from this environment (yacs, ftfy,
gdown, torchvision, torcheval). Golden-fixture generators import
:func:`install` FIRST; it patches torch for CPU and registers lightweight
stand-ins so ``trainers.mm_classifier_one_prompt`` /
``trainers.coop_mm_classifier`` / ``dassl.engine`` import and run on torch
CPU:

- ``torch.Tensor.cuda`` / ``nn.Module.cuda`` -> identity (CPU run);
- ``torch.float16`` aliased to ``torch.float32`` (the reference hard-codes
  fp16 dtypes, e.g. ``mm_classifier_one_prompt.py:99``; goldens are fp32);
- ``yacs.config.CfgNode`` -> our compatible CfgNode;
- ``ftfy.fix_text`` -> our vendored ``ovmr_tpu.text.fix_text`` (token-id
  parity with real ftfy is pinned in tests/test_fix_text.py);
- ``torchvision`` / ``gdown`` / ``torcheval`` -> inert catch-alls (only
  touched at import time on the golden paths; calling them raises or
  returns an inert object).

Used by ``tools/gen_trajectory_golden.py`` (and future reference-driven
generators). NOT imported by the shipped package or the test suite.
"""

import sys
import types

REF = "/root/reference"
DASSL = "/root/reference/Dassl.pytorch"


class _AnyMeta(type):
    def __getattr__(cls, name):
        return cls


class _Any(metaclass=_AnyMeta):
    """Subclassable, callable, attribute-transparent stand-in."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self


def _anymod(name):
    m = types.ModuleType(name)

    def _getattr(attr):  # PEP 562 catch-all; dunders must stay absent
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        return _Any

    m.__getattr__ = _getattr
    sys.modules[name] = m
    return m


def install(repo_root="."):
    """Patch torch + register stubs; returns the patched torch module."""
    for p in (repo_root, DASSL, REF):
        if p not in sys.path:
            sys.path.insert(0, p)

    import torch
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    torch.float16 = torch.float32

    # torch 2.13 removed LRScheduler.__init__'s `verbose` arg; the reference
    # wrappers (dassl/optim/lr_scheduler.py:22) pass it positionally
    import torch.optim.lr_scheduler as _lrs

    _orig_sched_init = _lrs.LRScheduler.__init__

    def _sched_init(self, optimizer, last_epoch=-1, verbose="deprecated"):
        _orig_sched_init(self, optimizer, last_epoch)

    _lrs.LRScheduler.__init__ = _sched_init

    from ovmr_tpu.text.fix_text import fix_text
    from ovmr_tpu.utils.config import CfgNode

    yacs = types.ModuleType("yacs")
    yacs_cfg = types.ModuleType("yacs.config")
    yacs_cfg.CfgNode = CfgNode
    yacs.config = yacs_cfg
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_cfg

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = fix_text
    sys.modules["ftfy"] = ftfy

    def _no_download(*a, **k):
        raise RuntimeError("gdown stubbed out in the reference harness")

    gdown = types.ModuleType("gdown")
    gdown.download = _no_download
    sys.modules["gdown"] = gdown

    tv = _anymod("torchvision")
    tv.transforms = _anymod("torchvision.transforms")
    tv.transforms.functional = _anymod("torchvision.transforms.functional")

    te = _anymod("torcheval")
    te.metrics = _anymod("torcheval.metrics")
    te.metrics.functional = _anymod("torcheval.metrics.functional")

    _anymod("wilds")  # dassl.data.datasets.dg.wilds imports it at module load

    return torch


def zero_dropout(module):
    """Deterministic-trajectory knob: zero every Dropout p and attention
    dropout in a built reference module tree (goldens replay exact values;
    dropout masks are not reproducible across frameworks)."""
    import torch.nn as nn

    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0


def sparsify_token_embedding(clip_model, used_ids):
    """Zero every token-embedding row not in ``used_ids`` so the saved
    fixture compresses (the 49408-row table would dominate the npz)."""
    import torch

    with torch.no_grad():
        w = clip_model.token_embedding.weight
        keep = torch.zeros(w.shape[0], dtype=torch.bool)
        keep[torch.as_tensor(sorted(set(int(i) for i in used_ids)))] = True
        w[~keep] = 0.0
