"""Reference-path shim: ``draco.util.filters`` -> :mod:`draco_tpu.ops.filters`."""

from ..ops.filters import *  # noqa: F401,F403
from ..ops.filters import (  # noqa: F401
    highpass_weighted_convolution_filter,
    lowpass_weighted_convolution_filter,
    medfilt,
)
