"""Minimal native HEALPix (RING scheme) geometry.

The environment provides no healpy; the reference consumes it through
``cora.util.hputil`` (reference draco/synthesis/stream.py:85,
draco/analysis/mapmaker.py:112).  Only the RING-scheme geometry needed for
the spherical-harmonic transform and beam evaluation is implemented: ring
tables, pixel centre angles, and pixel vectors.  Formulas follow the
standard HEALPix definition (Gorski et al. 2005).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def npix_of(nside: int) -> int:
    return 12 * nside * nside


def nside_of(npix: int) -> int:
    nside = int(round(np.sqrt(npix / 12)))
    if 12 * nside * nside != npix:
        raise ValueError(f"npix={npix} is not a valid HEALPix size")
    return nside


@dataclass
class RingInfo:
    """Per-ring geometry of a RING-ordered HEALPix map.

    Attributes
    ----------
    nside : resolution
    nring : number of iso-latitude rings (4*nside - 1)
    theta : colatitude of each ring [nring]
    nphi : pixels in each ring [nring]
    phi0 : azimuth of the first pixel centre in each ring [nring]
    offset : start pixel index of each ring [nring]
    """

    nside: int
    nring: int
    theta: np.ndarray
    nphi: np.ndarray
    phi0: np.ndarray
    offset: np.ndarray
    weight: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.weight is None:
            # Equal-area quadrature: every pixel has solid angle 4*pi/npix.
            self.weight = np.full(self.nring, 4 * np.pi / npix_of(self.nside))


def ring_info(nside: int) -> RingInfo:
    """Compute the ring table for ``nside``."""
    if nside < 1 or (nside & (nside - 1)) != 0:
        raise ValueError(f"nside must be a positive power of two, got {nside}")
    nring = 4 * nside - 1
    theta = np.zeros(nring)
    nphi = np.zeros(nring, dtype=np.int64)
    phi0 = np.zeros(nring)
    offset = np.zeros(nring, dtype=np.int64)

    idx = 0
    pix = 0
    # North polar cap: rings i = 1 .. nside-1, 4i pixels each,
    # z = 1 - i^2/(3 nside^2), first pixel centre at pi/(4i).
    for i in range(1, nside):
        z = 1.0 - i * i / (3.0 * nside * nside)
        theta[idx] = np.arccos(z)
        nphi[idx] = 4 * i
        phi0[idx] = np.pi / (4 * i)
        offset[idx] = pix
        pix += 4 * i
        idx += 1
    # Equatorial belt: rings i = nside .. 3 nside, 4 nside pixels each,
    # z = 4/3 - 2i/(3 nside), phase alternating by half a pixel.
    for i in range(nside, 3 * nside + 1):
        z = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
        theta[idx] = np.arccos(z)
        nphi[idx] = 4 * nside
        s = (i - nside + 1) % 2
        phi0[idx] = (np.pi / (4 * nside)) * s
        offset[idx] = pix
        pix += 4 * nside
        idx += 1
    # South polar cap mirrors the north cap.
    for i in range(nside - 1, 0, -1):
        z = -(1.0 - i * i / (3.0 * nside * nside))
        theta[idx] = np.arccos(z)
        nphi[idx] = 4 * i
        phi0[idx] = np.pi / (4 * i)
        offset[idx] = pix
        pix += 4 * i
        idx += 1
    assert pix == npix_of(nside)
    return RingInfo(nside, nring, theta, nphi, phi0, offset)


def pix2ang(nside: int, ipix=None):
    """Colatitude/azimuth of RING-ordered pixel centres.

    Returns (theta, phi) arrays for all pixels if ``ipix`` is None.
    """
    info = ring_info(nside)
    npix = npix_of(nside)
    theta = np.zeros(npix)
    phi = np.zeros(npix)
    for r in range(info.nring):
        o, n = info.offset[r], info.nphi[r]
        theta[o : o + n] = info.theta[r]
        phi[o : o + n] = info.phi0[r] + 2 * np.pi * np.arange(n) / n
    if ipix is not None:
        return theta[ipix], phi[ipix]
    return theta, phi


def pix2vec(nside: int, ipix=None):
    """Unit vectors of RING-ordered pixel centres, shape [npix, 3]."""
    theta, phi = pix2ang(nside, ipix)
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], axis=-1)


def ang2pix(nside: int, theta, phi):
    """Nearest RING pixel for (theta, phi) (ring-row then nearest-phi)."""
    info = ring_info(nside)
    theta = np.atleast_1d(np.asarray(theta, dtype=np.float64))
    phi = np.mod(np.atleast_1d(np.asarray(phi, dtype=np.float64)), 2 * np.pi)
    ring = np.clip(
        np.searchsorted(info.theta, theta) - 0, 0, info.nring - 1
    )
    # choose closer of ring and ring-1
    ring_m1 = np.clip(ring - 1, 0, info.nring - 1)
    pick_prev = np.abs(info.theta[ring_m1] - theta) < np.abs(
        info.theta[ring] - theta
    )
    ring = np.where(pick_prev, ring_m1, ring)
    nphi = info.nphi[ring]
    j = np.round((phi - info.phi0[ring]) * nphi / (2 * np.pi)).astype(np.int64)
    j = np.mod(j, nphi)
    return info.offset[ring] + j


def nside2resol(nside: int) -> float:
    """Approximate pixel resolution in radians."""
    return np.sqrt(4 * np.pi / npix_of(nside))
