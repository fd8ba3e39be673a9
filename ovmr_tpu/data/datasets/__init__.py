"""Importing this package registers every bundled dataset loader."""

from . import detection, fine_grained, imagenet, synthetic  # noqa: F401
