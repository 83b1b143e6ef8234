"""Tests for sidereal grouping/regridding/stacking."""

import numpy as np
import pytest

from draco_tpu.analysis import sidereal
from draco_tpu.core import containers
from draco_tpu.telescope import UnpolarisedDishArray


@pytest.fixture
def observer():
    return UnpolarisedDishArray(
        grid_ew=2, grid_ns=1, spacing_ew=5.0, latitude=40.0, num_freq=2,
        force_lmax=10, force_mmax=10,
    )


def make_day_stream(observer, lsd=100, ntime=96, nfreq=2, nfeed=2, jitter=0.0):
    """A TimeStream covering exactly one sidereal day."""
    t0 = observer.lsd_to_unix(lsd)
    t1 = observer.lsd_to_unix(lsd + 1)
    time = np.linspace(t0, t1, ntime, endpoint=False)
    if jitter:
        rng = np.random.Generator(np.random.SFC64(2))
        dt = (t1 - t0) / ntime
        time = time + rng.uniform(-jitter, jitter, ntime) * dt
        time.sort()
    ts = containers.TimeStream(
        freq=np.array([400.0, 500.0])[:nfreq], input=nfeed, time=time
    )
    lsds = observer.unix_to_lsd(time)
    phase = 2 * np.pi * (lsds - lsd)
    # smooth periodic signal: a couple of m modes
    sig = (
        1.0
        + 0.5 * np.cos(3 * phase)
        + 0.2 * np.sin(7 * phase)
        + 0.1j * np.sin(2 * phase)
    )
    ts.vis[:] = np.broadcast_to(sig, ts.vis.shape).astype(np.complex64)
    ts.weight[:] = 1.0
    ts.attrs["lsd"] = lsd
    return ts


def test_sidereal_grouper(observer):
    g = sidereal.SiderealGrouper()
    g.read_config({})
    g.setup(observer)
    # three files spanning two LSDs
    lsd = 50
    t0 = observer.lsd_to_unix(lsd)
    day = 86164.0905
    files = []
    for i in range(3):
        time = t0 + i * day * 0.7 + np.arange(64) * (day * 0.7 / 64)
        ts = containers.TimeStream(freq=np.array([400.0]), input=2, time=time)
        ts.vis[:] = 1.0
        ts.weight[:] = 1.0
        files.append(ts)
    outs = [g.process(f) for f in files]
    outs.append(g.process_finish())
    days = [o for o in outs if o is not None]
    assert len(days) >= 1
    assert "lsd" in days[0].attrs


@pytest.mark.parametrize(
    "cls",
    [
        sidereal.SiderealRegridder,
        sidereal.SiderealRegridderNearest,
        sidereal.SiderealRegridderLinear,
        sidereal.SiderealRegridderCubic,
    ],
)
def test_regridders_recover_smooth_signal(observer, cls):
    ts = make_day_stream(observer, ntime=128, jitter=0.2)
    task = cls()
    task.read_config({"samples": 64})
    task.setup(observer)
    out = task.process(ts)
    assert isinstance(out, containers.SiderealStream)
    assert out.vis.shape[-1] == 64

    # Expected signal at the output grid
    phase = 2 * np.pi * np.arange(64) / 64
    expect = (
        1.0
        + 0.5 * np.cos(3 * phase)
        + 0.2 * np.sin(7 * phase)
        + 0.1j * np.sin(2 * phase)
    )
    got = np.asarray(out.vis[:])[0, 0]
    w = np.asarray(out.weight[:])[0, 0]
    valid = w > 0
    # linear/cubic flag grid points whose neighbours are further than the
    # median input spacing (jittered inputs); fewer survive there
    min_valid = 20 if cls in (
        sidereal.SiderealRegridderLinear, sidereal.SiderealRegridderCubic
    ) else 32
    assert valid.sum() > min_valid
    tol = 0.15 if cls is sidereal.SiderealRegridderNearest else 0.05
    assert np.abs(got[valid] - expect[valid]).max() < tol


def test_rebinner_and_gradient_correction(observer):
    ts = make_day_stream(observer, ntime=256)
    task = sidereal.SiderealRebinner()
    task.read_config({"samples": 64})
    task.setup(observer)
    out = task.process(ts)
    assert "effective_ra" in out.datasets
    assert "nsample" in out.datasets
    # roughly 4 samples per bin
    assert np.isclose(np.asarray(out.nsample[:]).mean(), 4.0, atol=1.0)

    corr = sidereal.RebinGradientCorrection()
    corr.read_config({})
    corr.setup(out)
    fixed = corr.process(out)
    assert "effective_ra" not in fixed.datasets
    assert np.isfinite(np.asarray(fixed.vis[:])).all()


def test_sidereal_stacker(observer):
    stacker = sidereal.SiderealStacker()
    stacker.read_config({"with_sample_variance": True})
    rng = np.random.Generator(np.random.SFC64(5))
    truth = None
    days = []
    for d in range(4):
        ss = containers.SiderealStream(
            freq=np.array([400.0, 500.0]), input=2, ra=32
        )
        if truth is None:
            truth = rng.standard_normal(ss.vis.shape) + 1j * rng.standard_normal(
                ss.vis.shape
            )
        noise = 0.1 * (
            rng.standard_normal(ss.vis.shape)
            + 1j * rng.standard_normal(ss.vis.shape)
        )
        ss.vis[:] = (truth + noise).astype(np.complex64)
        ss.weight[:] = 100.0  # 1/var with var = 2*0.1^2 per component
        ss.attrs["lsd"] = d
        days.append(ss)
        stacker.process(ss)
    stack = stacker.process_finish()
    assert np.array_equal(stack.attrs["lsd"], np.arange(4))
    # the stack is the mean over days
    mean = np.mean([np.asarray(d.vis[:]) for d in days], axis=0)
    assert np.allclose(np.asarray(stack.vis[:]), mean, atol=1e-5)
    # weights accumulate
    assert np.allclose(np.asarray(stack.weight[:]), 400.0)
    assert np.asarray(stack.nsample[:]).max() == 4
    # sample variance is around the noise level (2 * 0.01 per complex comp)
    sv = np.asarray(stack.sample_variance[:])
    assert np.isclose(sv[0].mean() + sv[2].mean(), 0.02, rtol=0.5)


def test_sidereal_stacker_uniform(observer):
    """Uniform weighting averages days equally regardless of weights."""
    stacker = sidereal.SiderealStacker()
    stacker.read_config({"weight": "uniform"})
    rng = np.random.Generator(np.random.SFC64(7))
    days = []
    for d in range(3):
        ss = containers.SiderealStream(
            freq=np.array([400.0, 500.0]), input=2, ra=16
        )
        ss.vis[:] = (
            rng.standard_normal(ss.vis.shape)
            + 1j * rng.standard_normal(ss.vis.shape)
        ).astype(np.complex64)
        # wildly different weights must not change a uniform stack mean
        ss.weight[:] = 10.0 ** (d - 1)
        ss.attrs["lsd"] = d
        days.append(ss)
        stacker.process(ss)
    stack = stacker.process_finish()
    mean = np.mean([np.asarray(d.vis[:]) for d in days], axis=0)
    assert np.allclose(np.asarray(stack.vis[:]), mean, atol=1e-5)
    assert np.asarray(stack.nsample[:]).max() == 3
    # final weight is nsample^2 / sum(1/w)
    expect_w = 9.0 / sum(1.0 / 10.0 ** (d - 1) for d in range(3))
    assert np.allclose(np.asarray(stack.weight[:]), expect_w, rtol=1e-5)


def test_sidereal_stacker_match(observer):
    stacker = sidereal.SiderealStackerMatch()
    stacker.read_config({})
    rng = np.random.Generator(np.random.SFC64(6))
    truth = rng.standard_normal((1, 3, 32)) + 1j * rng.standard_normal((1, 3, 32))
    truth -= np.median(truth.real, axis=2)[..., None] + 1j * np.median(
        truth.imag, axis=2
    )[..., None]
    for d in range(3):
        ss = containers.SiderealStream(freq=np.array([400.0]), input=2, ra=32)
        # each day has a different additive crosstalk offset
        ss.vis[:] = (truth + (d + 1) * 2.0).astype(np.complex64)
        ss.weight[:] = 1.0
        ss.attrs["lsd"] = d
        stacker.process(ss)
    out = stacker.process_finish()
    got = np.asarray(out.vis[:])
    # Per-day offsets are marginalised away; recovered up to the median fix
    assert np.allclose(got.real, truth.real, atol=0.2)
