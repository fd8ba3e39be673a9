"""Modeling zoo (reference vendored ``dassl/modeling/``): CNN backbones,
heads, DDAIG generator networks and the functional op library.

The reference vendors these but OVMR's own path never exercises them
(SURVEY §2 D19/D20); here they are LIVE — registered, constructible, and
driven by the DA/DG/SSL trainers in ``ovmr_tpu.engine.{da,dg,ssl}`` and
their tests.
"""

from .backbones import BACKBONE_REGISTRY, build_backbone
from .heads import HEAD_REGISTRY, build_head
from .networks import NETWORK_REGISTRY, build_network

__all__ = [
    "BACKBONE_REGISTRY",
    "build_backbone",
    "HEAD_REGISTRY",
    "build_head",
    "NETWORK_REGISTRY",
    "build_network",
]
