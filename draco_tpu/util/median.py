"""Weighted median shim (caput ``algorithms.median`` equivalent)."""

from ..ops.median import moving_weighted_median, weighted_median  # noqa: F401
