"""Reference-path shim: ``draco.util.kernels`` -> :mod:`draco_tpu.ops.kernels`."""

from ..ops.kernels import *  # noqa: F401,F403
from ..ops.kernels import (  # noqa: F401
    convert_band_diagonal,
    euclidean_difference_kernel,
    gaussian_kernel,
    get_kernel,
    is_hermitian_positive_definite,
    matern_kernel,
    moving_average_inverse_kernel,
    periodic_kernel,
    rational_kernel,
    squared_difference_kernel,
)
