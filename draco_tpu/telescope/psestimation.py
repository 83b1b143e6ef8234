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

TPU design: every m shares the packed KL dimension n (zero-padded
upstream), so the band covariances for ALL (m, band) pairs are built by
one batched einsum chain on device, and q / Fisher / bias reduce to a
handful of einsum contractions over [M, nbands, n, n] — no per-m host
loops.  The per-m ``q_estimator`` API survives as a slice of the batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import config
from ..ops import cosmology as cosmo
from ..ops import tools
from ..parallel import mesh as pmesh


class PSEstimation(config.Reader):
    """Flat-band-power quadratic estimator in the KL basis.

    Attributes
    ----------
    bands_kpar, bands_kperp : list
        Band edges in h/Mpc.
    threshold : float
        KL threshold used when building the band covariances.
    """

    bands_kpar = config.list_prop(None)
    bands_kperp = config.list_prop(None)
    threshold = config.float_prop(None)

    def __init__(self, bt=None, kl=None):
        self.beamtransfer = bt
        self.kltransform = kl
        self._batch = None
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

    # ------------------------------------------------------------------
    def _ensure_batch(self):
        """Build C_a in the KL basis for every (m, band) in one device pass.

        Caches ``C_kl`` [M, nbands, n, n] (device) and the masked inverse
        total-covariance diagonal ``ci`` [M, n] with ci = 1/(lambda + 1)
        on kept modes and 0 on cut/padded ones — so every later
        contraction automatically restricts itself to the truncated
        basis the reference builds explicitly per m.
        """
        if self._batch is not None:
            return self._batch
        kl = self.kltransform
        C_sky = np.stack(
            [self._band_sky_cov(b) for b in range(self.nbands)]
        )  # [nbands, l, f, f']
        C_svd = kl._svd_cov_all(C_sky)  # [M, nbands, n, n] device
        M = C_svd.shape[0]
        if not kl._modes:
            kl._compute_all_modes()
        evals = np.stack([kl._modes[m][0] for m in range(M)])  # [M, n]
        # fwd = V^H rows: C_kl = V^H C V, the basis in which the total
        # covariance is diag(evals + 1).  tunnel-safe complex upload.
        fwd = tools.numpy_to_device(
            np.stack([kl._modes[m][2] for m in range(M)])
        )
        C_kl = jnp.einsum(
            "mia,mxab,mjb->mxij", fwd, C_svd, fwd.conj(), optimize=True
        )
        thr = kl.threshold if self.threshold is None else self.threshold
        if kl.subset:
            nmode = (evals > thr).sum(axis=1)
        else:
            # cap at the valid packed rank: padded / sub-svcut SVD dims
            # are zeroed in the data by the beam-transfer keep mask, so
            # counting them in the Fisher/bias traces would bias the
            # band powers low
            svd_n = np.asarray(self.beamtransfer._svd["nmode"])  # [f, M]
            nmode = np.minimum(evals.shape[1], svd_n.sum(axis=0))
        keep = np.arange(evals.shape[1])[None] < nmode[:, None]
        ci = jnp.asarray(np.where(keep, 1.0 / (evals + 1.0), 0.0))
        self._batch = (C_kl, ci, nmode)
        return self._batch

    def _band_kl_cov(self, m: int, band: int):
        """Band covariance in the truncated KL basis for one m (compat)."""
        C_kl, ci, nmode = self._ensure_batch()
        n = int(nmode[m])
        evals = self.kltransform._modes[m][0]
        return np.asarray(C_kl[m, band, :n, :n]), evals[:n]

    # ------------------------------------------------------------------
    def q_estimator(self, m: int, vec) -> np.ndarray:
        """Band powers q_a = x^H C^-1 C_a C^-1 x for one m."""
        vec = np.asarray(vec)
        if vec.size == 0:
            return np.zeros(self.nbands)
        C_kl, ci, _ = self._ensure_batch()
        n = C_kl.shape[-1]
        x = np.zeros(n, dtype=complex)
        x[: min(len(vec), n)] = vec[:n]
        xw = tools.numpy_to_device(x) * ci[m]
        q = jnp.einsum("i,xij,j->x", xw.conj(), C_kl[m], xw)
        return np.asarray(q.real)

    def q_estimator_all(self, vis, nmode) -> np.ndarray:
        """Band powers summed over every m in one device contraction.

        vis : [M, nmax] complex KL-basis vectors (zero-padded); nmode is
        accepted for API symmetry with the container but the masked
        ``ci`` already zeroes cut modes.
        """
        del nmode
        C_kl, ci, _ = self._ensure_batch()
        n = C_kl.shape[-1]
        x = np.zeros((C_kl.shape[0], n), dtype=complex)
        m_avail = min(x.shape[0], vis.shape[0])
        w = min(n, vis.shape[1])
        x[:m_avail, :w] = vis[:m_avail, :w]
        # Under an installed mesh the m axis of the band covariances and
        # KL vectors is sharded (named axis "m", or the 1-D shard mesh's
        # primary) and the contraction's m-sum becomes an XLA psum over
        # the mesh — the reference's MPI-summed per-m q loop (reference
        # draco/analysis/powerspectrum.py:62-77) as SPMD.
        C_kl = pmesh.shard_array_named(C_kl, ("m", "band", "i", "j"), "m")
        ci = pmesh.shard_array_named(ci, ("m", "i"), "m")
        xw = (
            pmesh.shard_array_named(
                tools.numpy_to_device(x), ("m", "i"), "m"
            )
            * ci
        )
        q = jnp.einsum("mi,mxij,mj->x", xw.conj(), C_kl, xw, optimize=True)
        return tools.device_to_numpy(q.real)

    def fisher_bias(self):
        """Fisher matrix and noise bias accumulated over all m.

        F_ab = 1/2 sum_m Re Tr[Ci C_a Ci C_b], b_a = sum_m Re Tr[Ci C_a]
        with Ci the masked diagonal inverse covariance — two einsums on
        device instead of the reference's nested m x band x band loops.
        """
        if self._fisher is None:
            C_kl, ci, _ = self._ensure_batch()
            # m-sharded under a mesh (see q_estimator_all): the m-sum
            # traces accumulate with an XLA psum across devices
            C_kl = pmesh.shard_array_named(C_kl, ("m", "band", "i", "j"), "m")
            ci = pmesh.shard_array_named(ci, ("m", "i"), "m")
            bias = jnp.einsum("mi,mxii->x", ci, C_kl).real
            fisher = 0.5 * jnp.einsum(
                "mi,mxij,mj,myji->xy", ci, C_kl, ci, C_kl, optimize=True
            ).real
            fisher = 0.5 * (fisher + fisher.T)
            self._fisher = tools.device_to_numpy(fisher)
            self._bias = tools.device_to_numpy(bias)
        return self._fisher, self._bias

    def generate(self, regen: bool = False):
        self.genbands()
        return self
