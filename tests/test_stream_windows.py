"""Disk-backed per-time-window streaming composite.

The reference's production workflow streams files one at a time from
disk through stateful accumulator tasks (file chains in
/root/reference/doc/tutorial.rst:108-163; stateful LSD grouping in
reference draco/analysis/sidereal.py:27-148; cross-boundary constrained
GP gain realisations in reference draco/synthesis/gain.py:242-293).
These tests drive that loop here: window files on disk ->
LoadFilesFromParams (with I/O prefetch) -> ReceiverTemperature ->
RandomGains -> ApplyGain -> SampleNoise, checking the window loop
itself, cross-window GP continuity, per-window noise independence, and
prefetch transparency.
"""

import numpy as np
import pytest

from draco_tpu.analysis.calibration import ApplyGain
from draco_tpu.core import containers, io
from draco_tpu.core.pipeline import PipelineStopIteration
from draco_tpu.synthesis import gain as gain_mod
from draco_tpu.synthesis import noise as noise_mod

DT = 10.0


def _write_windows(tmp_path, nwin=4, nfeed=4, ntime=8, equal_vis=False):
    """Contiguous-time TimeStream window files; returns the file list."""
    rng = np.random.Generator(np.random.SFC64(11))
    nprod = nfeed * (nfeed + 1) // 2
    base = (
        0.1 * rng.standard_normal((1, nprod, ntime))
        + 0.1j * rng.standard_normal((1, nprod, ntime))
    ).astype(np.complex64)
    files = []
    for w in range(nwin):
        ts = containers.TimeStream(
            freq=np.array([800.0]),
            input=nfeed,
            time=1.4e9 + (w * ntime + np.arange(ntime)) * DT,
        )
        if equal_vis:
            ts.vis[:] = base
        else:
            ts.vis[:] = (
                0.1 * rng.standard_normal((1, nprod, ntime))
                + 0.1j * rng.standard_normal((1, nprod, ntime))
            ).astype(np.complex64)
        ts.weight[:] = 1.0
        fname = str(tmp_path / f"win{w:02d}.h5")
        ts.save(fname)
        files.append(fname)
    return files


def _stream_composite(files, sigma_amp=0.05, corr_length=36000.0):
    """Run the window loop; returns (gain arrays, noised vis arrays)."""
    loader = io.LoadFilesFromParams()
    loader.read_config(
        {"files": list(files), "distributed": False, "prefetch": True}
    )
    rt = noise_mod.ReceiverTemperature()
    rt.read_config({"recv_temp": 50.0})
    g = gain_mod.RandomGains()
    g.read_config(
        {
            "seed": 5,
            "sigma_amp": sigma_amp,
            "sigma_phase": 0.001,
            "corr_length_amp": corr_length,
            "corr_length_phase": corr_length,
        }
    )
    ap = ApplyGain()
    ap.read_config({"inverse": False})
    sn = noise_mod.SampleNoise()
    sn.read_config({"seed": 6, "sample_frac": 1.0})

    gains, noised = [], []
    while True:
        try:
            ts = loader.process()
        except PipelineStopIteration:
            break
        ts = rt.process(ts)
        gn = g.process(ts)
        gains.append(np.asarray(gn.gain[:]).copy())
        ts = ap.process(ts, gn)
        ts = sn.process(ts)
        noised.append(np.asarray(ts.vis[:]).copy())
    return gains, noised


def test_window_loop_runs_all_files(tmp_path):
    files = _write_windows(tmp_path, nwin=4)
    gains, noised = _stream_composite(files)
    assert len(gains) == 4 and len(noised) == 4
    for v in noised:
        assert np.isfinite(v).all()


def test_gain_continuity_across_windows(tmp_path):
    """GP gains are CONDITIONED on the previous window's boundary: the
    cross-boundary step must look like a within-window step (tiny, set
    by dt/corr_length), not an independent redraw (~sigma*sqrt(2))."""
    sigma = 0.05
    files = _write_windows(tmp_path, nwin=4)
    gains, _ = _stream_composite(files, sigma_amp=sigma)
    amp = np.concatenate([np.abs(g) for g in gains], axis=-1)  # [f, in, t]
    ntime = gains[0].shape[-1]
    steps = np.abs(np.diff(amp, axis=-1))
    boundary = steps[..., ntime - 1 :: ntime]  # the cross-file steps
    within = np.delete(
        steps, np.arange(ntime - 1, steps.shape[-1], ntime), axis=-1
    )
    # Independent redraw would give boundary steps ~ sigma*sqrt(2) =
    # 0.07; conditioned GP steps at dt/corr = 10/36000 are ~1e-4.
    assert boundary.max() < 0.1 * sigma
    assert boundary.max() < 20 * max(within.max(), 1e-12)


def test_noise_draws_differ_between_identical_windows(tmp_path):
    """Two windows with IDENTICAL expectations get different Wishart
    draws: the task key advances per process() call."""
    files = _write_windows(tmp_path, nwin=2, equal_vis=True)
    _, noised = _stream_composite(files, sigma_amp=1e-8)
    assert not np.allclose(noised[0], noised[1])


def test_prefetch_transparent(tmp_path):
    """prefetch: true yields the same container sequence as eager loads."""
    files = _write_windows(tmp_path, nwin=3)

    def load_all(prefetch):
        loader = io.LoadFilesFromParams()
        loader.read_config(
            {"files": list(files), "distributed": False, "prefetch": prefetch}
        )
        out = []
        while True:
            try:
                out.append(np.asarray(loader.process().vis[:]).copy())
            except PipelineStopIteration:
                return out

    eager = load_all(False)
    pre = load_all(True)
    assert len(eager) == len(pre) == 3
    for a, b in zip(eager, pre):
        np.testing.assert_array_equal(a, b)
