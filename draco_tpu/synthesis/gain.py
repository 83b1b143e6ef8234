"""Random gain fluctuation simulation and stacking.

Re-provides reference ``draco/synthesis/gain.py`` (BaseGains:11,
SiderealGains:116, RandomGains:223, RandomSiderealGains:296, GainStacker:305,
generate_fluctuations:442, gaussian_realisation:479,
constrained_gaussian_realisation:522).

Gain streams are Gaussian processes with squared-exponential covariance;
streams crossing file boundaries stay statistically consistent via
constrained realisations against the previous chunk (the checkpoint/resume
behaviour noted in SURVEY.md section 5).
"""

from __future__ import annotations

import numpy as np

from ..core import config, containers, io
from ..core.containers import empty_like
from ..core.task import ContainerTask, PipelineStopIteration, RandomTask
from ..ops.tools import invert_no_zero


class BaseGains(ContainerTask, RandomTask):
    """Generate gain timestreams matching an input container.

    (reference gain.py:11)
    """

    amp = config.Property(default=True, proptype=bool)
    phase = config.Property(default=True, proptype=bool)

    _prev_time = None

    def process(self, data):
        data.redistribute("freq")
        time = data.time
        gain_data = containers.GainData(axes_from=data)

        self.ninput_local = gain_data.gain.shape[1]
        self.ninput_global = gain_data.gain.shape[1]
        self.freq = data.index_map["freq"]["centre"][:]

        gain_amp = 1.0
        gain_phase = 0.0
        if self.amp:
            gain_amp = self._generate_amp(time)
        if self.phase:
            gain_phase = self._generate_phase(time)

        gain_comb = gain_amp * np.exp(1.0j * gain_phase)
        gain_data.gain[:] = gain_comb.astype(gain_data.gain.dtype)
        self._prev_time = time
        return gain_data

    def _corr_func(self, zeta, amp):
        """Squared-exponential correlation function (reference gain.py:74)."""

        def _cf(x):
            dij = x[:, np.newaxis] - x[np.newaxis, :]
            return amp**2 * np.exp(-0.5 * (dij / zeta) ** 2)

        return _cf

    def _generate_amp(self, time):
        raise NotImplementedError

    def _generate_phase(self, time):
        raise NotImplementedError


class SiderealGains(BaseGains):
    """Simulate gains over a range of sidereal days (reference gain.py:116)."""

    start_time = config.utc_time()
    end_time = config.utc_time()

    def setup(self, bt, sstream):
        self.observer = io.get_telescope(bt)
        self.lsd_start = self.observer.unix_to_lsd(self.start_time)
        self.lsd_end = self.observer.unix_to_lsd(self.end_time)
        self.log.info(
            "Sidereal period requested: LSD=%i to LSD=%i",
            int(self.lsd_start),
            int(self.lsd_end),
        )
        self._current_lsd = None
        self.sstream = sstream

    def process(self):
        if self._current_lsd is None:
            self._current_lsd = int(self.lsd_start + 1)
        if self._current_lsd >= self.lsd_end:
            raise PipelineStopIteration()

        unix_start = self.observer.lsd_to_unix(self._current_lsd)
        unix_end = self.observer.lsd_to_unix(self._current_lsd + 1)

        data = self.sstream
        data.redistribute("freq")
        self.freq = data.index_map["freq"]["centre"][:]
        nra = len(data.ra)
        time = np.linspace(unix_start, unix_end, nra, endpoint=False)

        gain_data = containers.SiderealGainData(axes_from=data)
        self.ninput_local = gain_data.gain.shape[1]
        self.ninput_global = gain_data.gain.shape[1]

        gain_amp = 1.0
        gain_phase = 0.0
        if self.amp:
            gain_amp = self._generate_amp(time)
        if self.phase:
            gain_phase = self._generate_phase(time)

        gain_comb = gain_amp * np.exp(1.0j * gain_phase)
        gain_data.gain[:] = gain_comb.astype(gain_data.gain.dtype)
        gain_data.attrs["lsd"] = self._current_lsd
        gain_data.attrs["tag"] = f"lsd_{self._current_lsd:d}"
        self._current_lsd += 1
        self._prev_time = time
        return gain_data


class RandomGains(BaseGains):
    r"""Random Gaussian-process gain fluctuations (reference gain.py:223).

    Attributes
    ----------
    corr_length_amp, corr_length_phase : float
        Correlation lengths in seconds.
    sigma_amp, sigma_phase : float
        Fluctuation size for amplitude (fractional) and phase (radians).
    """

    corr_length_amp = config.Property(default=3600.0, proptype=float)
    corr_length_phase = config.Property(default=3600.0, proptype=float)
    sigma_amp = config.Property(default=0.02, proptype=float)
    sigma_phase = config.Property(default=0.1, proptype=float)

    _prev_amp = None
    _prev_phase = None

    def _generate_amp(self, time):
        cf_amp = self._corr_func(self.corr_length_amp, self.sigma_amp)
        ninput = self.ninput_local
        n = len(self.freq) * ninput
        gain_amp = generate_fluctuations(
            time, cf_amp, n, self._prev_time, self._prev_amp, rng=self.rng
        )
        self._prev_amp = gain_amp
        return 1.0 + gain_amp.reshape((len(self.freq), ninput, len(time)))

    def _generate_phase(self, time):
        cf_phase = self._corr_func(self.corr_length_phase, self.sigma_phase)
        ninput = self.ninput_local
        n = len(self.freq) * ninput
        gain_phase = generate_fluctuations(
            time, cf_phase, n, self._prev_time, self._prev_phase, rng=self.rng
        )
        self._prev_phase = gain_phase
        return gain_phase.reshape((len(self.freq), ninput, len(time)))


class RandomSiderealGains(RandomGains, SiderealGains):
    """Random gains on a sidereal grid (reference gain.py:296)."""


class GainStacker(ContainerTask):
    r"""Stack products of gain streams over days (reference gain.py:305).

    G_ij = sum_days g_i(t) conj(g_j(t)).
    """

    only_gains = config.Property(default=False, proptype=bool)

    gain_stack = None
    lsd_list = None

    def setup(self, stream):
        self.stream = stream

    def process(self, gain):
        stream = self.stream
        prod = stream.index_map["prod"]
        input_lsd = gain.attrs.get("lsd", -1)
        input_lsd = list(input_lsd) if hasattr(input_lsd, "__iter__") else [input_lsd]

        g = np.asarray(gain.gain[:])
        ii = prod["input_a"].astype(int)
        jj = prod["input_b"].astype(int)
        gprod = g[:, ii] * np.conjugate(g[:, jj])

        if self.gain_stack is None:
            self.gain_stack = empty_like(stream)
            self.gain_stack.vis[:] = gprod.astype(self.gain_stack.vis.dtype)
            self.gain_stack.weight[:] = np.ones(self.gain_stack.weight.shape)
            self.lsd_list = input_lsd
            self.log.info("Starting gain stack with LSD:%i", input_lsd[0])
            return None

        self.log.info("Adding LSD:%i to gain stack", input_lsd[0])
        self.gain_stack.vis[:] = (
            np.asarray(self.gain_stack.vis[:]) + gprod
        ).astype(self.gain_stack.vis.dtype)
        self.gain_stack.weight[:] = np.asarray(self.gain_stack.weight[:]) + 1.0
        self.lsd_list += input_lsd
        return None

    def process_finish(self):
        gs_vis = np.asarray(self.gain_stack.vis[:])
        gs_w = np.asarray(self.gain_stack.weight[:])
        if (self.stream.vis.shape[-1] != gs_vis.shape[-1]) or self.only_gains:
            self.log.info("Saving only gain stack")
            self.gain_stack.vis[:] = (gs_vis * invert_no_zero(gs_w)).astype(
                self.gain_stack.vis.dtype
            )
            return self.gain_stack

        data = empty_like(self.stream)
        data.vis[:] = (
            np.asarray(self.stream.vis[:]) * gs_vis * invert_no_zero(gs_w)
        ).astype(data.vis.dtype)
        data.weight[:] = np.asarray(self.stream.weight[:])
        data.attrs["tag"] = "gain_stack"
        return data


# ---------------------------------------------------------------------------
# Gaussian field helpers (reference gain.py:442-596)
# ---------------------------------------------------------------------------


def generate_fluctuations(x, corrfunc, n, prev_x, prev_fluc, rng=None):
    """Correlated random streams, constrained against previous chunks.

    (reference gain.py:442)
    """
    nx = len(x)
    if prev_fluc is None:
        return gaussian_realisation(x, corrfunc, n, rng=rng).reshape(n, nx)
    return constrained_gaussian_realisation(
        x, corrfunc, n, prev_x, prev_fluc, rng=rng
    ).reshape(n, nx)


def gaussian_realisation(x, corrfunc, n, rcond: float = 1e-12, rng=None):
    """Gaussian random field via eigen-truncated covariance.

    (reference gain.py:479)
    """
    return _realisation(corrfunc(np.asarray(x)), n, rcond, rng=rng)


def _realisation(C, n, rcond, rng=None):
    if rng is None:
        rng = np.random.default_rng()
    evals, evecs = np.linalg.eigh(C)
    num = int(np.sum(evals > rcond * evals[-1]))
    R = evecs[:, -num:] * evals[np.newaxis, -num:] ** 0.5
    w = rng.standard_normal((n, num))
    return w @ R.T


def constrained_gaussian_realisation(
    x, corrfunc, n, x2, y2, rcond: float = 1e-12, rng=None
):
    """Gaussian field consistent with existing samples (x2, y2).

    (reference gain.py:522): blockwise conditioning in the non-singular
    eigenbasis of the covariance.
    """
    x = np.asarray(x)
    x2 = np.asarray(x2)
    y2 = np.asarray(y2)
    if (y2.ndim >= 2) and (n != y2.shape[0]):
        raise ValueError("Array y2 of existing data has the wrong shape.")

    xc = np.concatenate([x, x2])
    M = corrfunc(xc)

    nl = len(x)
    A = M[:nl, :nl]
    B = M[:nl, nl:]
    C = M[nl:, nl:]

    evals_A, evecs_A = np.linalg.eigh(A)
    evals_C, evecs_C = np.linalg.eigh(C)
    num_A = int(np.sum(evals_A > rcond * evals_A.max()))
    num_C = int(np.sum(evals_C > rcond * evals_C.max()))
    R_A = evecs_A[:, -num_A:]
    R_C = evecs_C[:, -num_C:]

    A_r = np.diag(evals_A[-num_A:])
    B_r = R_A.T @ B @ R_C
    Ci_r = np.diag(1.0 / evals_C[-num_C:])

    y2_r = y2 @ R_C
    z_r = y2_r @ (Ci_r @ B_r.T)

    Ap_r = A_r - B_r @ Ci_r @ B_r.T
    y_r = _realisation(Ap_r, n, rcond, rng=rng)
    return (z_r + y_r) @ R_A.T
