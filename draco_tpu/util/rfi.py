"""Reference-path shim: ``draco.util.rfi`` -> :mod:`draco_tpu.ops.rfi`."""

from ..ops.rfi import *  # noqa: F401,F403
from ..ops.rfi import scale_invariant_rank, sir, sir1d, sumthreshold  # noqa: F401
