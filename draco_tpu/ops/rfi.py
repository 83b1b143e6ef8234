"""RFI excision algorithms: SumThreshold and the SIR operator.

Re-provides reference ``draco/util/rfi.py`` (sumthreshold_py:8,
scale_invariant_rank:205, sir:260) with the windowed sums expressed as
convolutions/cumulative scans that vectorise over all leading axes.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import correlate1d

__all__ = ["sumthreshold", "sumthreshold_py", "scale_invariant_rank", "sir1d", "sir"]


def sumthreshold_py(
    data,
    max_m: int = 16,
    start_flag=None,
    threshold1=None,
    remove_median: bool = True,
    correct_for_missing: bool = True,
    variance=None,
    rho=None,
    axes=None,
    only_positive: bool = False,
):
    """SumThreshold outlier detection (reference rfi.py:8-140).

    See https://andreoffringa.org/pdfs/SumThreshold-technical-report.pdf.
    """
    data = np.copy(np.asarray(data, dtype=np.float64))

    if variance is not None:
        correct_for_missing = True
    if rho is None:
        rho = 0.9428 if correct_for_missing else 1.5

    def get_sign(x):
        return x if only_positive else np.abs(x)

    if axes is None:
        axes = list(range(data.ndim))[::-1]
    elif isinstance(axes, int):
        axes = (axes,)

    flag = ~np.isfinite(data)
    if start_flag is not None:
        flag = flag + start_flag

    if remove_median:
        data -= np.median(data[~flag])

    if threshold1 is None:
        if variance is not None:
            raise RuntimeError(
                "If variance is provided, then must also provide starting "
                "threshold in units of sigma."
            )
        threshold1 = np.percentile(data[~flag], 95.0)

    m = 1
    while m <= max_m:
        threshold = threshold1 / rho ** (np.log2(m))
        centre = (m - 1) // 2
        kernel = np.ones(m, dtype=np.float64)

        for axis in axes:
            data[flag] = 0.0
            count = (
                (~flag).astype(np.float64) if variance is None else ~flag * variance
            )
            dconv = correlate1d(
                data, kernel, origin=centre, axis=axis, mode="nearest"
            )
            cconv = correlate1d(
                count, kernel, origin=centre, axis=axis, mode="nearest"
            )
            if correct_for_missing:
                cconv = cconv**0.5
            temp_flag = get_sign(dconv) > cconv * threshold
            origin = m % 2 - centre - 1
            flag += correlate1d(
                temp_flag, kernel, origin=origin, axis=axis, mode="nearest"
            )
        m *= 2

    return flag


sumthreshold = sumthreshold_py


def sir1d(basemask, eta: float = 0.2, axis: int = -1):
    """Scale-invariant rank operator along one axis (reference rfi.py:147).

    See arXiv:1201.3364v2.  Vectorised cumulative-extrema formulation over
    all leading axes.
    """
    basemask = np.moveaxis(np.asarray(basemask, dtype=bool), axis, -1).copy()

    M = np.zeros((*basemask.shape[:-1], basemask.shape[-1] + 1), dtype=np.float64)
    M[..., 1:] = basemask
    M[..., 1:] += eta - 1.0
    np.cumsum(M[..., 1:], axis=-1, out=M[..., 1:])

    MP = np.minimum.accumulate(M, axis=-1)[..., :-1]
    np.maximum.accumulate(M[..., -2::-1], axis=-1, out=M[..., -2::-1])
    basemask |= M[..., 1:] >= MP
    return np.moveaxis(basemask, -1, axis)


_sir_lastaxis = sir1d


def scale_invariant_rank(basemask, eta=0.2, axis=-1):
    """SIR along one or more axes, OR-combined (reference rfi.py:205)."""
    basemask = np.asarray(basemask, dtype=bool)
    if basemask.ndim < 1:
        raise ValueError("basemask must have at least one dimension.")
    if isinstance(axis, int):
        axis = (axis,)
    if isinstance(eta, (float, int)):
        eta = (eta,) * len(axis)
    if len(eta) != len(axis):
        raise ValueError(
            "If eta is a tuple, it must have the same length as axis. "
            f"Got len(eta)={len(eta)} and len(axis)={len(axis)}."
        )
    newmask = sir1d(basemask, eta=eta[0], axis=axis[0])
    for ax, et in zip(axis[1:], eta[1:]):
        newmask |= sir1d(basemask, eta=et, axis=ax)
    return newmask


def sir(basemask, eta: float = 0.2, only_freq: bool = False, only_time: bool = False):
    """SIR over the freq and time axes of [freq, prod, time] data.

    (reference rfi.py:260, deprecated there; kept for parity)
    """
    basemask = np.asarray(basemask, dtype=bool)
    if basemask.ndim != 3:
        raise ValueError(
            "basemask must be a 3D array with [freq, prod, time] axes. "
            f"Got {basemask.ndim}D array instead."
        )
    if only_freq and only_time:
        raise ValueError("Only one of only_freq and only_time can be True.")
    newmask = basemask.copy()
    if not only_time:
        newmask |= sir1d(basemask, eta=eta, axis=0)
    if not only_freq:
        newmask |= sir1d(basemask, eta=eta, axis=2)
    return newmask
