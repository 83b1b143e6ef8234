"""Quadratic power spectrum estimation products.

Native replacement for ``drift.core.psestimation`` (API usage:
``manager.psestimators[name].genbands()/q_estimator(m, vec)/fisher_bias()``
at reference draco/analysis/powerspectrum.py:62-74).

The estimator works in the KL basis: for each (kpar, kperp) band a flat
band-power covariance C_a is built (plane-wave frequency kernel integrated
over the band, angular mask over the band's l range), projected through
the SVD+KL bases, and q_a = v^H C^-1 C_a C^-1 v is accumulated over m.
The Fisher matrix F_ab = Tr[C^-1 C_a C^-1 C_b] / 2 and noise bias
b_a = Tr[C^-1 C_a] come from the same band matrices.
"""

from __future__ import annotations

import numpy as np

from ..core import config
from ..ops import cosmology as cosmo


class PSEstimation(config.Reader):
    """Flat-band-power quadratic estimator in the KL basis.

    Attributes
    ----------
    bands_kpar, bands_kperp : list
        Band edges in h/Mpc.
    threshold : float
        KL threshold used when building the band covariances.
    """

    bands_kpar = config.Property(proptype=list, default=None)
    bands_kperp = config.Property(proptype=list, default=None)
    threshold = config.Property(proptype=float, default=None)

    def __init__(self, bt=None, kl=None):
        self.beamtransfer = bt
        self.kltransform = kl
        self._band_cov = {}
        self._fisher = None
        self._bias = None

    @classmethod
    def from_config(cls, cfg, bt=None, kl=None):
        self = cls(bt, kl)
        self.read_config(cfg or {})
        return self

    # ------------------------------------------------------------------
    def genbands(self):
        """Define the (kpar, kperp) bands."""
        if self.bands_kpar is None:
            self.bands_kpar = list(np.linspace(0.0, 0.6, 5))
        if self.bands_kperp is None:
            self.bands_kperp = list(np.linspace(0.0, 0.3, 4))
        self.kpar_bands = np.asarray(self.bands_kpar)
        self.kperp_bands = np.asarray(self.bands_kperp)
        self.nbands = (len(self.kpar_bands) - 1) * (len(self.kperp_bands) - 1)
        tel = self.beamtransfer.telescope
        self._zmean = float(np.mean(cosmo.freq_to_z(tel.frequencies)))
        self._csm = cosmo.Cosmology()
        self._chi = self._csm.comoving_distance_h(
            cosmo.freq_to_z(tel.frequencies)
        )  # [nfreq] Mpc/h
        return self

    def _band_sky_cov(self, band: int):
        """Sky covariance [l, f, f'] of a unit flat band power."""
        tel = self.beamtransfer.telescope
        ip = band // (len(self.kperp_bands) - 1)
        iq = band % (len(self.kperp_bands) - 1)
        kpar_lo, kpar_hi = self.kpar_bands[ip], self.kpar_bands[ip + 1]
        kperp_lo, kperp_hi = self.kperp_bands[iq], self.kperp_bands[iq + 1]

        chi_mean = self._chi.mean()
        lmax = tel.lmax
        ell = np.arange(lmax + 1, dtype=np.float64)
        # l range of this band: l = kperp * chi
        lmask = (ell >= kperp_lo * chi_mean) & (ell < kperp_hi * chi_mean)

        # Frequency kernel: integral of cos(kpar * dchi) over the band
        dchi = self._chi[:, None] - self._chi[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            K = (np.sin(kpar_hi * dchi) - np.sin(kpar_lo * dchi)) / dchi
        K = np.where(np.abs(dchi) < 1e-8, kpar_hi - kpar_lo, K)
        K = K / (np.pi * chi_mean**2)

        return lmask[:, None, None] * K[None]

    def _band_kl_cov(self, m: int, band: int):
        """Band covariance projected into the truncated KL basis for m."""
        key = (m, band)
        if key not in self._band_cov:
            kl = self.kltransform
            C_svd = kl._svd_cov(m, self._band_sky_cov(band))
            evals, evecs, einv = kl.modes_m(m, self.threshold)
            # forward projection rows: einv [nkl, nsvd]
            C_kl = einv @ C_svd @ np.conj(einv).T
            self._band_cov[key] = (C_kl, evals)
        return self._band_cov[key]

    # ------------------------------------------------------------------
    def q_estimator(self, m: int, vec) -> np.ndarray:
        """Band powers q_a = x^H C^-1 C_a C^-1 x for one m."""
        vec = np.asarray(vec)
        if vec.size == 0:
            return np.zeros(self.nbands)
        q = np.zeros(self.nbands)
        for band in range(self.nbands):
            C_a, evals = self._band_kl_cov(m, band)
            nkl = C_a.shape[0]
            x = vec[:nkl]
            # Total covariance in KL basis: diag(lambda + 1)
            ci = 1.0 / (evals[:nkl] + 1.0)
            xw = ci * x
            q[band] = np.real(np.conj(xw) @ (C_a @ xw))
        return q

    def fisher_bias(self):
        """Fisher matrix and noise bias accumulated over all m."""
        if self._fisher is None:
            tel = self.beamtransfer.telescope
            nb = self.nbands
            fisher = np.zeros((nb, nb))
            bias = np.zeros(nb)
            for m in range(tel.mmax + 1):
                covs = []
                evals = None
                for band in range(nb):
                    C_a, evals = self._band_kl_cov(m, band)
                    covs.append(C_a)
                if evals is None or len(evals) == 0:
                    continue
                nkl = covs[0].shape[0]
                ci = 1.0 / (evals[:nkl] + 1.0)
                wc = [ci[:, None] * C_a * ci[None, :] for C_a in covs]
                for a in range(nb):
                    bias[a] += float(np.real(np.sum(ci * np.diag(covs[a]))))
                    for b in range(a, nb):
                        f_ab = 0.5 * float(
                            np.real(np.sum(wc[a].T * (covs[b])))
                        )
                        fisher[a, b] += f_ab
                        fisher[b, a] = fisher[a, b]
            self._fisher = fisher
            self._bias = bias
        return self._fisher, self._bias

    def generate(self, regen: bool = False):
        self.genbands()
        return self
