"""Utility namespace: testing helpers and compat re-exports.

The reference keeps its numerical helpers in ``draco/util``; here the
device-side equivalents live in :mod:`draco_tpu.ops` and this package holds
host-side utilities (mock-data generators, the DummyTask test producer).
"""

from ..ops import tools  # noqa: F401  (reference `draco.util.tools` path)
from ..ops import random as _random  # noqa: F401
