"""Test utilities: dummy tasks and mock data generators.

Re-provides reference ``draco/util/testing.py`` (DummyTask:11,
mock_freq_data:47, RandomFreqData:115).
"""

from __future__ import annotations

import numpy as np

from ..core import config
from ..core.containers import ContainerBase, SiderealStream
from ..core.task import ContainerTask, PipelineStopIteration, RandomTask
from ..ops.random import complex_normal_np


class DummyTask(ContainerTask):
    """Produce empty containers for testing (reference testing.py:11).

    Attributes
    ----------
    total_len : int
        Number of containers to produce.  Default 1.
    tag : str
        Tag attached to each produced container.
    """

    total_len = config.Property(default=1, proptype=int)
    tag = config.Property(proptype=str)

    def process(self):
        """Produce an empty container, or stop when exhausted."""
        if self.total_len == 0:
            raise PipelineStopIteration

        self.log.debug(f"Producing test data '{self.tag}'...")

        cont = ContainerBase()
        if "tag" not in cont.attrs:
            cont.attrs["tag"] = self.tag

        self.total_len -= 1
        return cont


def mock_freq_data(
    freq: np.ndarray,
    ntime: int,
    delaycut: float,
    ndata: int | None = None,
    noise: float = 0.0,
    bad_freq: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
):
    """Mock data with a flat delay spectrum up to ``delaycut``.

    (reference testing.py:47-112)

    Returns (data [ndata, freq, time] or [freq, time], weights).
    """
    nfreq = len(freq)
    ndelay = nfreq

    df = np.abs(freq[1] - freq[0])

    delays = np.fft.fftfreq(ndelay, df)
    dspec = np.where(np.abs(delays) < delaycut, 1.0, 0.0)

    delay_spectra = complex_normal_np(size=(ntime, ndelay), rng=rng)
    delay_spectra *= dspec**0.5

    outshape = (nfreq, ntime)
    if ndata is not None:
        outshape = (ndata, *outshape)
    data = noise * complex_normal_np(size=outshape, rng=rng)
    data += np.fft.fft(delay_spectra, axis=-1).T

    weights = np.empty(data.shape, dtype=np.float64)
    weights[:] = 1.0 / noise**2 if noise > 0 else 1.0

    if bad_freq is not None and len(bad_freq):
        data[..., bad_freq, :] = 0.0
        weights[..., bad_freq, :] = 0.0

    return data, weights


class RandomFreqData(RandomTask):
    """Generate random sidereal streams with delay structure.

    (reference testing.py:115-208)

    Attributes
    ----------
    num_realisation : int
        Process calls before stopping.
    num_correlated : int
        Number of correlated realisations per cycle (None = single).
    num_ra, num_base, num_freq : int
        Output axis sizes.
    freq_start, freq_end : float
        Band edges in MHz.
    delay_cut : float
        Maximum delay in the data (microseconds).
    noise : float
        RMS noise level.
    """

    num_realisation = config.Property(proptype=int, default=1)
    num_correlated = config.Property(proptype=int, default=None)

    num_ra = config.Property(proptype=int)
    num_base = config.Property(proptype=int)

    freq_start = config.Property(proptype=float, default=800.0)
    freq_end = config.Property(proptype=float, default=400.0)
    num_freq = config.Property(proptype=int, default=1024)

    delay_cut = config.Property(proptype=float, default=0.2)
    noise = config.Property(proptype=float, default=1e-5)

    def next(self):
        """Generate the next (set of) correlated sidereal stream(s)."""
        if self.num_realisation == 0:
            raise PipelineStopIteration()

        freq = np.linspace(
            self.freq_start, self.freq_end, self.num_freq, endpoint=False
        )

        ncorr = self.num_correlated or 1
        streams = [
            SiderealStream(
                input=5, freq=freq, ra=self.num_ra, stack=self.num_base,
                prod=self.num_base,
            )
            for _ in range(ncorr)
        ]

        vis = np.zeros(
            (ncorr, self.num_freq, self.num_base, self.num_ra),
            dtype=np.complex64,
        )
        wgt = np.zeros(
            (self.num_freq, self.num_base, self.num_ra), dtype=np.float32
        )
        for bb in range(self.num_base):
            d, w = mock_freq_data(
                freq, self.num_ra, self.delay_cut, ndata=ncorr,
                noise=self.noise, rng=self.rng,
            )
            vis[:, :, bb] = d
            wgt[:, bb] = w[0]

        for jj, stream in enumerate(streams):
            stream.vis[:] = vis[jj]
            stream.weight[:] = wgt

        self.num_realisation -= 1

        if self.num_correlated is None:
            return streams[0]
        return streams
