"""Model namespace: the instrument models of the framework.

In this domain the "model family" is the telescope hierarchy (the analogue
of driftscan's telescope classes, consumed throughout the reference via
``io.get_telescope``): geometry, primary beams, baseline redundancy and the
derived beam-transfer operators.  This module re-exports them under the
conventional ``models`` path; the implementations live in
:mod:`draco_tpu.telescope`.
"""

from ..telescope import (  # noqa: F401
    BeamTransfer,
    PolarisedCylinderTelescope,
    ProductManager,
    SimplePolarisedTelescope,
    SimpleUnpolarisedTelescope,
    TransitTelescope,
    UnpolarisedCylinderTelescope,
    UnpolarisedDishArray,
)
