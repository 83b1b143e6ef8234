"""Gaussian-process covariance kernels.

Re-provides reference ``draco/util/kernels.py`` (gaussian:65, rational:95,
matern:131, periodic:187, moving_average_inverse:229,
convert_band_diagonal:381): covariance builders used by the GP regridders
and the delay maximum-likelihood prior.
"""

from __future__ import annotations

import numpy as np
from scipy.special import gamma as gamma_fn
from scipy.special import kv

__all__ = [
    "gaussian",
    "rational",
    "matern",
    "periodic",
    "moving_average_inverse",
    "convert_band_diagonal",
    "get_kernel",
]


def _distances(x, y=None):
    x = np.asarray(x, dtype=np.float64)
    y = x if y is None else np.asarray(y, dtype=np.float64)
    return np.abs(x[:, np.newaxis] - y[np.newaxis, :])


def gaussian(x, y=None, *, width: float = 1.0, alpha: float = 1.0, epsilon: float = 0.0):
    """Squared-exponential kernel (reference kernels.py:65)."""
    r = _distances(x, y)
    K = alpha**2 * np.exp(-0.5 * (r / width) ** 2)
    if epsilon and (y is None):
        K = K + epsilon * np.eye(K.shape[0])
    return K


def rational(
    x, y=None, *, width: float = 1.0, alpha: float = 1.0, a: float = 1.0,
    epsilon: float = 0.0,
):
    """Rational quadratic kernel (reference kernels.py:95)."""
    r = _distances(x, y)
    K = alpha**2 * (1 + r**2 / (2 * a * width**2)) ** (-a)
    if epsilon and (y is None):
        K = K + epsilon * np.eye(K.shape[0])
    return K


def matern(
    x, y=None, *, width: float = 1.0, alpha: float = 1.0, nu: float = 2.5,
    epsilon: float = 0.0,
):
    """Matern kernel of order nu (reference kernels.py:131)."""
    r = _distances(x, y)
    arg = np.sqrt(2 * nu) * r / width
    with np.errstate(invalid="ignore", over="ignore"):
        K = (
            alpha**2
            * (2 ** (1 - nu) / gamma_fn(nu))
            * arg**nu
            * kv(nu, arg)
        )
    K = np.where(r == 0, alpha**2, K)
    K = np.nan_to_num(K)
    if epsilon and (y is None):
        K = K + epsilon * np.eye(K.shape[0])
    return K


def periodic(
    x, y=None, *, width: float = 1.0, alpha: float = 1.0, period: float = 1.0,
    epsilon: float = 0.0,
):
    """Exp-sine-squared periodic kernel (reference kernels.py:187)."""
    r = _distances(x, y)
    K = alpha**2 * np.exp(-2 * np.sin(np.pi * r / period) ** 2 / width**2)
    if epsilon and (y is None):
        K = K + epsilon * np.eye(K.shape[0])
    return K


def moving_average_inverse(n: int, width: int, alpha: float = 1.0):
    """Inverse covariance of a moving-average smoothness prior.

    (reference kernels.py:229): D^T D regulariser where D is a
    moving-average difference operator of the given width.
    """
    D = np.eye(n) - np.ones((n, n)) / n
    # local moving-average operator
    M = np.zeros((n, n))
    for i in range(n):
        lo = max(0, i - width // 2)
        hi = min(n, i + width // 2 + 1)
        M[i, lo:hi] = 1.0 / (hi - lo)
    D = np.eye(n) - M
    return alpha * (D.T @ D)


def convert_band_diagonal(K: np.ndarray, bw: int | None = None):
    """Convert a dense symmetric matrix to lower band-diagonal storage.

    (reference kernels.py:381): ab[d, j] = K[j+d, j] for d = 0..bw.
    """
    n = K.shape[0]
    if bw is None:
        # find effective bandwidth
        nz = np.nonzero(np.abs(K) > 1e-12 * np.abs(K).max())
        bw = int(np.abs(nz[0] - nz[1]).max()) if len(nz[0]) else 0
    ab = np.zeros((bw + 1, n), dtype=K.dtype)
    for d in range(bw + 1):
        ab[d, : n - d] = np.diag(K, -d)
    return ab, bw


_KERNELS = {
    "gaussian": gaussian,
    "rational": rational,
    "matern": matern,
    "periodic": periodic,
}


def get_kernel(spec: dict):
    """Build a kernel function from a spec dict with a 'name' key."""
    spec = dict(spec)
    name = spec.pop("name")
    fn = _KERNELS[name]

    def k(x, y=None):
        return fn(x, y, **spec)

    return k
