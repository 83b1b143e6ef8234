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
from ..ops import tools


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

    subset = config.bool_prop(True)
    threshold = config.float_prop(0.1)
    signal_amp = config.float_prop(1.0)
    signal_tilt = config.float_prop(1.0)
    signal_corr_freq = config.float_prop(2.0)
    foreground_amp = config.float_prop(100.0)
    foreground_tilt = config.float_prop(3.0)
    foreground_spec_corr = config.float_prop(0.999)
    noise_amp = config.float_prop(1e-2)

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
        return tools.device_to_numpy(self._svd_cov_cache[1][m, 0])

    def _noise_svd(self, m: int) -> np.ndarray:
        """Single-m noise covariance (compat shim over the batch)."""
        if getattr(self, "_noise_svd_cache", None) is None:
            self._noise_svd_cache = self._noise_svd_all()
        return tools.device_to_numpy(self._noise_svd_cache[m])

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

        N = _regularise(N)
        evals, evecs, einv = _whitened_eigh(S, N)
        self._store_modes(evals, evecs, einv)

    def _store_modes(self, evals, evecs, einv):
        """Cache (evals, bwd, fwd) per m — the STATISTICAL convention.

        The data projection is fwd = V^H (rows = KL modes): with
        v^H N v = I the projected covariance is V^H (S+N) V =
        diag(lambda + 1) EXACTLY, which is what the quadratic estimator's
        diagonal inverse-covariance weighting assumes (driftscan
        convention).  bwd = V^{-H} (columns = KL modes) inverts it:
        fwd @ bwd = I.  (Projecting with V^{-1} instead — a basis change
        that also round-trips — gives a NON-diagonal covariance and
        silently biases the band powers.)
        """
        evals = np.asarray(evals.real)
        fwd = tools.device_to_numpy(jnp.conj(jnp.swapaxes(evecs, -1, -2)))
        bwd = tools.device_to_numpy(jnp.conj(jnp.swapaxes(einv, -1, -2)))
        for m in range(evals.shape[0]):
            self._modes[m] = (evals[m], bwd[m], fwd[m])

    def modes_m(self, m: int, threshold: float | None = None):
        """(evals, bwd, fwd) for one m, high-S/N first.

        ``fwd`` [nmode, n] projects SVD-basis data into the KL basis
        (cov(fwd x) = diag(evals + 1)); ``bwd`` [n, nmode] maps back
        (fwd @ bwd = I on the kept modes).
        """
        if m not in self._modes:
            self._compute_all_modes()
        evals, bwd, fwd = self._modes[m]
        thr = self.threshold if threshold is None else threshold
        nmode = int((evals > thr).sum()) if self.subset else len(evals)
        return evals[:nmode], bwd[:, :nmode], fwd[:nmode]

    def project_vector_svd_to_kl(self, m: int, vec, threshold=None):
        """SVD-basis vector(s) -> KL basis (truncated)."""
        evals, bwd, fwd = self.modes_m(m, threshold)
        vec = np.asarray(vec)
        n = fwd.shape[1]
        v = np.zeros(n, dtype=complex) if vec.ndim == 1 else np.zeros(
            (n,) + vec.shape[1:], dtype=complex
        )
        v[: min(len(vec), n)] = vec[: min(len(vec), n)]
        return fwd @ v

    def project_vector_kl_to_svd(self, m: int, vec, threshold=None):
        """KL-basis vector(s) -> SVD basis (zero-padding short input)."""
        evals, bwd, fwd = self.modes_m(m, threshold)
        vec = np.asarray(vec)
        nkl = bwd.shape[1]
        v = np.zeros(
            (nkl,) + vec.shape[1:], dtype=complex
        )
        v[: min(len(vec), nkl)] = vec[:nkl]
        return bwd @ v

    # -- batched all-m projections -----------------------------------------
    def modes_all(self, threshold=None):
        """Stacked modes over every m: (evals, bwd, fwd, nmode).

        evals [M, n], bwd/fwd [M, n, n] (high-S/N modes first, as in
        :meth:`modes_m`), nmode [M] = per-m kept-mode count at the
        threshold.  Host f64 — the KL bases' dynamic range (foregrounds
        ~1e7 x signal) is exactly where f32 costs accuracy.
        """
        if 0 not in self._modes:
            self._compute_all_modes()
        M = max(self._modes) + 1
        evals = np.stack([self._modes[m][0] for m in range(M)])
        bwd = np.stack([self._modes[m][1] for m in range(M)])
        fwd = np.stack([self._modes[m][2] for m in range(M)])
        thr = self.threshold if threshold is None else threshold
        if self.subset:
            nmode = (evals > thr).sum(axis=1).astype(np.int32)
        else:
            nmode = np.full(M, evals.shape[1], dtype=np.int32)
        return evals, bwd, fwd, nmode

    def project_svd_to_kl(self, vecs, threshold=None):
        """Batched SVD->KL over every m.

        vecs [M, n_in, ...] -> (out [M, n, ...] zero-padded past each
        m's kept-mode count, nmode [M]).  One batched einsum replacing
        the reference's per-m host loop (reference fgfilter.py:190-203).
        """
        _, _, fwd, nmode = self.modes_all(threshold)
        n = fwd.shape[1]
        vecs = np.asarray(vecs)
        v = np.zeros((vecs.shape[0], n) + vecs.shape[2:], dtype=complex)
        ncopy = min(vecs.shape[1], n)
        v[:, :ncopy] = vecs[:, :ncopy]
        out = np.einsum("mkn,mn...->mk...", fwd, v)
        mask = np.arange(n)[None, :] < nmode[:, None]
        return out * mask.reshape(mask.shape + (1,) * (out.ndim - 2)), nmode

    def project_kl_to_svd(self, vecs, threshold=None):
        """Batched KL->SVD over every m (inverse of the above)."""
        _, bwd, _, nmode = self.modes_all(threshold)
        n = bwd.shape[1]
        vecs = np.asarray(vecs)
        v = np.zeros((vecs.shape[0], n) + vecs.shape[2:], dtype=complex)
        ncopy = min(vecs.shape[1], n)
        v[:, :ncopy] = vecs[:, :ncopy]
        mask = np.arange(n)[None, :] < nmode[:, None]
        v = v * mask.reshape(mask.shape + (1,) * (v.ndim - 2))
        return np.einsum("mnk,mk...->mn...", bwd, v)


def _regularise(X, eps: float = 1e-12):
    """Add a relative-eps diagonal so the Cholesky stays PD."""
    n = X.shape[-1]
    absmax = jnp.maximum(jnp.abs(X).reshape(X.shape[0], -1).max(axis=-1), 1e-30)
    return X + (eps * absmax)[:, None, None] * jnp.eye(n, dtype=X.dtype)


class DoubleKL(KLTransform):
    """Two-stage KL (driftscan DoubleKL semantics).

    Stage 1 solves the signal/(foreground+noise) pencil and RETAINS only
    modes with S/(F+N) above ``foreground_threshold`` — the foreground
    rejection; stage 2 re-solves signal/noise inside that subspace, so
    the final eigenvalues are true S/N ratios.  Batched over m: rejected
    directions are zeroed out of the stage-2 pencil, where they pick up
    ~0 eigenvalues, sort last, and fall to the threshold cut.
    """

    foreground_threshold = config.float_prop(100.0)

    def _compute_all_modes(self):
        bt = self.beamtransfer
        tel = bt.telescope
        freq = tel.frequencies
        lmax = tel.lmax

        C = np.stack(
            [self.signal(lmax, freq), self.foreground(lmax, freq)]
        )
        SC = self._svd_cov_all(C)
        S = SC[:, 0]
        F = SC[:, 1]
        Nt = self._noise_svd_all()

        # Stage 1: signal vs foreground(+noise)
        e1, v1, i1 = _whitened_eigh(S, _regularise(F + Nt))
        keep1 = e1.real > self.foreground_threshold
        P1 = jnp.where(
            keep1[..., None], jnp.conj(jnp.swapaxes(v1, -1, -2)), 0.0
        )
        P1h = jnp.conj(jnp.swapaxes(P1, -1, -2))

        # Stage 2: signal vs noise inside the retained subspace
        S2 = P1 @ S.astype(P1.dtype) @ P1h
        N2 = P1 @ Nt.astype(P1.dtype) @ P1h
        e2, v2, i2 = _whitened_eigh(S2, _regularise(N2))

        # Combined transforms: data fwd = V2^H P1, backward = its inverse
        fwd = jnp.conj(jnp.swapaxes(v2, -1, -2)) @ P1
        bwd = jnp.conj(jnp.swapaxes(i1, -1, -2)) @ jnp.conj(
            jnp.swapaxes(i2, -1, -2)
        )
        evals = np.asarray(e2.real)
        fwd = tools.device_to_numpy(fwd)
        bwd = tools.device_to_numpy(bwd)
        for m in range(evals.shape[0]):
            self._modes[m] = (evals[m], bwd[m], fwd[m])
