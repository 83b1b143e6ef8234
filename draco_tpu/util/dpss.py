"""Reference-path shim: ``draco.util.dpss`` -> :mod:`draco_tpu.ops.dpss`.

The reference-layout entry points (samples on the FIRST axis) are exposed
here; the batched device kernels with samples last live in
:mod:`draco_tpu.ops.dpss`.
"""

import numpy as np

from ..ops.dpss import (  # noqa: F401
    accumulate_variance as _accumulate_variance_lastaxis,
)
from ..ops.dpss import (  # noqa: F401
    atleast_Nd,
    filter,
    inpaint,
    make_covariance,
    get_basis,
    solve,
)
from ..ops.dpss import flag_above_cutoff as _flag_above_cutoff_lastaxis


def project(x, Ni, A):
    """Reference-layout projection: samples first (reference dpss.py:121)."""
    x, _ = atleast_Nd(np.asarray(x), 2)
    Ni, _ = atleast_Nd(np.asarray(Ni), 2)
    AT = np.asarray(A).T.conj()
    return AT @ (Ni * x)


def flag_above_cutoff(W, fc=None):
    """Reference-layout gap flagging: samples first (reference dpss.py:307)."""
    W = np.asarray(W, dtype=bool)
    if fc is None:
        return W
    return np.moveaxis(
        _flag_above_cutoff_lastaxis(np.moveaxis(W, 0, -1), fc), -1, 0
    )


def accumulate_variance(wo, wi, W):
    """Reference-layout variance accumulation (reference dpss.py:254)."""
    return np.moveaxis(
        _accumulate_variance_lastaxis(
            np.moveaxis(np.asarray(wo), 0, -1),
            np.moveaxis(np.asarray(wi), 0, -1),
            np.moveaxis(np.asarray(W), 0, -1),
        ),
        -1,
        0,
    )
