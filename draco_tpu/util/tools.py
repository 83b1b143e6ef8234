"""Reference-path shim: ``draco.util.tools`` -> :mod:`draco_tpu.ops.tools`."""

from ..ops.tools import *  # noqa: F401,F403
from ..ops.tools import (  # noqa: F401
    apply_gain,
    arPLS_1d,
    baseline_vector,
    broadcast_weights,
    calculate_redundancy,
    cmap,
    correct_phase_wrap,
    extract_diagonal,
    find_contiguous_slices,
    find_inputs,
    find_keys,
    IarPLS_1d,
    icmap,
    invert_no_zero,
    polarization_map,
    redefine_stack_index_map,
    taper_mask,
    window_generalised,
)
