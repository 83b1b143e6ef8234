"""Reference-path shim: ``draco.util.gaussian_process``.

-> :mod:`draco_tpu.ops.gaussian_process`
"""

from ..ops.gaussian_process import *  # noqa: F401,F403
from ..ops.gaussian_process import interpolate_unweighted, resample  # noqa: F401
