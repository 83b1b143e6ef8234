"""Reference-path shim: ``draco.util.interferometry``.

-> :mod:`draco_tpu.ops.interferometry`
"""

from ..ops.interferometry import (  # noqa: F401
    beamform_kernel,
    fringestop_phase,
    projected_distance,
)
