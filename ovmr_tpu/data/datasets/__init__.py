"""Importing this package registers every bundled dataset loader."""

from . import (  # noqa: F401
    da,
    detection,
    dg,
    fine_grained,
    imagenet,
    ssl,
    synthetic,
)
