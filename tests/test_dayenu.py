"""DAYENU filter tests: stop-band rejection, masks, tasks; Reduce* + HPF."""

import numpy as np
import pytest

from draco_tpu.analysis import dayenu, transform
from draco_tpu.core import containers
from draco_tpu.ops import dayenu as dayenu_ops
from draco_tpu.telescope import UnpolarisedDishArray


NFREQ = 64
FREQ = np.linspace(400.0, 464.0, NFREQ, endpoint=False)  # df = 1 MHz


def _tone(tau_us):
    """Unit tone at delay tau (microseconds) across FREQ (MHz)."""
    return np.exp(2.0j * np.pi * tau_us * FREQ)


def test_highpass_delay_filter_rejects_low_delay():
    flag = np.ones((NFREQ, 1), dtype=bool)
    NF, index = dayenu_ops.highpass_delay_filter(FREQ, 0.1, flag, epsilon=1e-12)
    assert NF.shape == (1, NFREQ, NFREQ)
    assert len(index) == 1 and np.array_equal(index[0], [0])

    low = _tone(0.02)  # inside stop band
    high = _tone(0.35)  # well outside
    low_out = NF[0] @ low
    high_out = NF[0] @ high
    assert np.abs(low_out).max() < 1e-4
    assert np.abs(high_out).max() > 0.8


def test_delay_filter_unique_masks():
    flag = np.ones((NFREQ, 4), dtype=bool)
    flag[10, :2] = False  # two distinct masks across time
    NF, index = dayenu_ops.highpass_delay_filter(FREQ, 0.1, flag)
    assert NF.shape[0] == 2
    # Union of indices covers all times exactly once
    allind = np.sort(np.concatenate(index))
    assert np.array_equal(allind, np.arange(4))
    # Masked frequency rows/cols are zero in its filter
    imask = [i for i, ind in enumerate(index) if 0 in ind][0]
    assert np.all(NF[imask][10] == 0) and np.all(NF[imask][:, 10] == 0)


def test_delay_filter_complex_stopband():
    flag = np.ones((NFREQ, 1), dtype=bool)
    # Stop band centred at +0.2 us only
    NF, _ = dayenu_ops.delay_filter(FREQ, flag, 0.05, 0.2, 1e-12)
    assert np.iscomplexobj(NF)
    # Stop-band tones are exp(-2 pi i tau f) for tau near +0.2
    inside = NF[0] @ _tone(-0.2)
    outside = NF[0] @ _tone(0.2)
    assert np.abs(inside).max() < 1e-4
    assert np.abs(outside).max() > 0.8


def test_mmode_filters():
    nra = 128
    ra = np.linspace(0, 2 * np.pi, nra, endpoint=False)
    flag = np.ones((1, nra), dtype=bool)

    m_lo, m_hi = 3.0, 30.0
    tone_lo = np.exp(1.0j * m_lo * ra)
    tone_hi = np.exp(1.0j * m_hi * ra)

    HP, _ = dayenu_ops.highpass_mmode_filter(ra, 10.0, flag)
    assert np.abs(HP[0] @ tone_lo).max() < 1e-4
    assert np.abs(HP[0] @ tone_hi).max() > 0.5

    LP, _ = dayenu_ops.lowpass_mmode_filter(ra, 10.0, flag)
    assert np.abs(LP[0] @ tone_hi).max() < 1e-3
    assert np.abs(LP[0] @ tone_lo).max() > 0.5

    BP, _ = dayenu_ops.bandpass_mmode_filter(ra, 20.0, 5.0, flag)
    tone_in = np.exp(1.0j * 20.0 * ra)
    assert np.abs(BP[0] @ tone_in).max() > 0.5
    assert np.abs(BP[0] @ tone_lo).max() < 1e-3


def test_instantaneous_m():
    # EW baseline at transit: m = -2 pi u cos(dec)
    m = dayenu_ops.instantaneous_m(0.0, np.radians(45), np.radians(30), 10.0, 0.0)
    assert np.isclose(m, -2 * np.pi * 10.0 * np.cos(np.radians(30)))


@pytest.fixture()
def tel():
    return UnpolarisedDishArray(
        grid_ew=2, grid_ns=2, spacing_ew=6.0, spacing_ns=6.0, latitude=45.0,
        freq_lower=400.0, freq_upper=464.0, num_freq=4,
    )


def _stream_with_foreground(rng, nra=8):
    """SiderealStream whose spectra are smooth (low delay) + noise floor."""
    nstack = 3
    prod = np.zeros(nstack, dtype=[("input_a", int), ("input_b", int)])
    prod["input_a"] = [0, 0, 1]
    prod["input_b"] = [1, 2, 2]
    ss = containers.SiderealStream(
        freq=FREQ, stack=nstack, input=4, prod=prod, ra=nra
    )
    smooth = _tone(0.01)[:, None, None]  # low-delay foreground
    ss.vis[:] = (10.0 * smooth * np.ones((NFREQ, nstack, nra))).astype(
        np.complex64
    )
    ss.weight[:] = np.ones((NFREQ, nstack, nra), dtype=np.float32)
    return ss


def test_dayenu_delay_filter_task(rng, tel):
    ss = _stream_with_foreground(rng)
    before = np.abs(np.asarray(ss.vis[:])).max()

    task = dayenu.DayenuDelayFilter()
    task.read_config({"tauw": 0.1, "za_cut": 0.0})
    task.setup(tel)
    out = task.process(ss)

    after = np.abs(np.asarray(out.vis[:])).max()
    assert after < 1e-4 * before
    assert np.isfinite(np.asarray(out.weight[:])).all()


def test_dayenu_delay_filter_flagged_channel(rng, tel):
    ss = _stream_with_foreground(rng)
    w = np.asarray(ss.weight[:])
    w[5] = 0.0  # one dead channel everywhere
    ss.weight[:] = w

    task = dayenu.DayenuDelayFilter()
    task.read_config({"tauw": 0.1, "za_cut": 0.0})
    task.setup(tel)
    out = task.process(ss)
    # Dead channel keeps zero weight and zero output
    assert np.all(np.asarray(out.weight[:])[5] == 0)
    assert np.abs(np.asarray(out.vis[:]))[5].max() == 0


def test_dayenu_fixed_cutoff_reduce(rng, tel):
    ss = _stream_with_foreground(rng)
    # Add unit-variance noise so chi2/dof ~ 1 after the foreground is removed
    noise = (rng.standard_normal(ss.vis.shape) + 1j * rng.standard_normal(ss.vis.shape)) / np.sqrt(2)
    ss.vis[:] = np.asarray(ss.vis[:]) + noise.astype(np.complex64)

    task = dayenu.DayenuDelayFilterFixedCutoff()
    task.read_config({"tauw": 0.1, "reduce_baseline": True})
    task.setup()
    out = task.process(ss)

    assert out is not ss
    assert out.vis.shape[1] == 1  # stack axis reduced
    chi2 = np.asarray(out.vis[:]).real
    valid = np.asarray(out.weight[:]) > 0
    # Very loose: the statistic should be O(1), not O(foreground^2)
    assert np.median(chi2[valid]) < 10.0


def test_dayenu_map_filter(rng):
    rm = containers.RingMap(
        freq=FREQ, beam=np.arange(1), pol=np.array(["XX"]), ra=4,
        el=np.linspace(-0.1, 0.1, 3),
    )
    smooth = np.cos(2 * np.pi * 0.01 * FREQ)
    marr = np.zeros(rm.map.shape)
    marr[..., :, :] = 5.0 * smooth[None, None, :, None, None]
    rm.map[:] = marr
    rm.datasets["weight"][:] = np.ones(rm.datasets["weight"].shape)

    task = dayenu.DayenuDelayFilterMap()
    task.read_config({"tauw": 0.1})
    task.setup()
    out = task.process(rm)
    assert np.abs(np.asarray(out.map[:])).max() < 1e-3 * 5.0


def test_dayenu_m_filter(rng):
    from draco_tpu.telescope import UnpolarisedCylinderTelescope

    tel = UnpolarisedCylinderTelescope(
        num_cylinders=2, num_feeds=2, cylinder_spacing=20.0, feed_spacing=6.0,
        latitude=45.0, freq_lower=400.0, freq_upper=420.0, num_freq=2,
    )
    nra = 64
    nstack = tel.nbase
    ss = containers.SiderealStream(
        freq=tel.frequencies, stack=nstack, input=tel.nfeed, prod=nstack, ra=nra
    )
    # Use the telescope's prod map so the task can compute EW baselines
    up = tel.uniquepairs
    prod = np.zeros(nstack, dtype=[("input_a", int), ("input_b", int)])
    prod["input_a"], prod["input_b"] = up[:, 0], up[:, 1]
    ss.create_index_map("prod", prod)
    ss.create_index_map(
        "stack",
        np.zeros(nstack, dtype=[("prod", int), ("conjugate", bool)]),
    )
    sm = ss.index_map["stack"]
    sm["prod"] = np.arange(nstack)

    ra = np.radians(np.asarray(ss.ra))
    vis = np.ones((len(tel.frequencies), nstack, nra), dtype=np.complex64)
    # A very high-m tone that should be filtered from intracylinder baselines
    vis += np.exp(1.0j * 25.0 * ra)[None, None, :]
    ss.vis[:] = vis
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)

    task = dayenu.DayenuMFilter()
    task.read_config({"dec": 45.0, "epsilon": 1e-10})
    task.setup(tel)
    out = task.process(ss)
    assert np.isfinite(np.asarray(out.vis[:])).all()


def test_reduce_var_and_chisq(rng):
    nfreq, nstack, nra = 4, 6, 8
    ss = containers.SiderealStream(
        freq=np.linspace(400, 404, nfreq), stack=nstack, input=4,
        prod=nstack, ra=nra,
    )
    vis = rng.standard_normal((nfreq, nstack, nra)) + 1j * rng.standard_normal(
        (nfreq, nstack, nra)
    )
    ss.vis[:] = vis.astype(np.complex64)
    ss.weight[:] = np.ones(ss.weight.shape, dtype=np.float32)

    task = transform.ReduceVar()
    task.read_config({"axes": ["stack"], "dataset": "vis", "weighting": "weighted"})
    out = task.process(ss)
    assert out.vis.shape == (nfreq, 1, nra)
    # reference semantics (transform.py:2087): the COMPLEX
    # pseudo-variance sum(w (d - mu)^2) / sum(w), not |d - mu|^2
    expect = np.mean((vis - vis.mean(axis=1, keepdims=True)) ** 2, axis=1)
    assert np.allclose(np.asarray(out.vis[:])[:, 0], expect, rtol=1e-4, atol=1e-5)

    task2 = transform.ReduceChisq()
    task2.read_config({"axes": ["stack"], "dataset": "vis"})
    out2 = task2.process(ss)
    assert out2.vis.shape == (nfreq, 1, nra)
    # chi2 per dof of unit-variance noise is O(1)
    assert 0.2 < np.median(np.asarray(out2.vis[:]).real) < 5.0
    assert np.all(np.asarray(out2.weight[:]) == nstack - 1)


def test_hpf_timestream(rng):
    nfreq, nstack, ntime = 2, 3, 256
    ts = containers.TimeStream(
        freq=np.array([400.0, 410.0]), stack=nstack, input=4, prod=nstack,
        time=np.arange(ntime, dtype=np.float64),
    )
    t = np.arange(ntime)
    slow = 4.0 * np.sin(2 * np.pi * t / 200.0)  # period 200 s >> tau
    fast = 1.0 * np.sin(2 * np.pi * t / 8.0)  # period 8 s << tau
    ts.vis[:] = (slow + fast)[None, None, :] * np.ones((nfreq, nstack, 1))
    ts.weight[:] = np.ones(ts.weight.shape, dtype=np.float32)

    task = transform.HPFTimeStream()
    task.read_config({"tau": 50.0})
    out = task.process(ts)
    v = np.asarray(out.vis[:]).real
    # Interior samples: slow mode strongly suppressed, fast mode kept
    mid = slice(40, -40)
    resid = v[0, 0, mid] - fast[mid]
    assert np.sqrt(np.mean(resid**2)) < 0.3 * np.std(slow)
    assert np.std(v[0, 0, mid]) > 0.5 * np.std(fast)


def test_dayenu_filter_survives_f32_default():
    """The DAYENU pinv must not depend on jax x64 being enabled.

    The covariance spans ~12 decades; an f32 eigh cutoff would truncate
    every O(1) pass-band eigenvalue and zero the filter. The pipeline
    never enables x64, so this pins the host-f64 fallback.
    """
    import jax

    flag = np.ones((NFREQ, 1), dtype=bool)
    NF_ref, _ = dayenu_ops.delay_filter(FREQ, flag, 0.05, 0.0, 1e-12)
    try:
        jax.config.update("jax_enable_x64", False)
        NF_f32, _ = dayenu_ops.delay_filter(FREQ, flag, 0.05, 0.0, 1e-12)
    finally:
        jax.config.update("jax_enable_x64", True)
    # the filter must remain ~the identity on the pass band
    assert np.abs(np.diag(NF_f32[0])).mean() > 0.5
    assert np.allclose(NF_f32, NF_ref, atol=1e-5)
